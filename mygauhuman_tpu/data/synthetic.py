"""Synthetic scene factory: self-consistent train batches without datasets.

ZJU-MoCap / MonoCap assets are licensed and not shipped; tests, benchmarks
and the driver entry points instead train against ground truth rendered from
a known "true" Gaussian scene on a synthetic SMPL body (models/smpl.py
synthetic_smpl). The optimization must recover the true colors/geometry from
a perturbed init — the same supervision structure as the reference datasets
(image + normal + masks, scene/dataset_readers.py:553-758) with an exactly
known optimum.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mygauhuman_tpu.data.camera import Camera, make_camera
from mygauhuman_tpu.models import gaussians as G
from mygauhuman_tpu.models.smpl import (
    SMPLModel,
    big_pose_params,
    smpl_forward,
    synthetic_smpl,
)
from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.render import FrameInputs, render_frame
from mygauhuman_tpu.train.trainer import TrainBatch
from mygauhuman_tpu.utils.transforms import inverse_sigmoid


class SyntheticScene(NamedTuple):
    smpl_model: SMPLModel
    gt_state: G.GaussianState       # the optimum
    init_state: G.GaussianState     # perturbed init for training
    batches: list                   # list[TrainBatch]
    big_pose_verts: jnp.ndarray
    extent: float
    raster_config: RasterizerConfig


def look_at_camera(eye, target, width, height, fov=1.0) -> Camera:
    """Camera at `eye` looking at `target` (camera +z forward)."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])
    if abs(np.dot(up, fwd)) > 0.98:
        up = np.array([0.0, 0.0, 1.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R_c2w = np.stack([right, down, fwd], axis=1)   # columns = cam axes
    t = -R_c2w.T @ eye                              # w2c translation
    return make_camera(R=R_c2w, t=t, width=width, height=height,
                       fovx=fov, fovy=fov)


def make_synthetic_scene(
    n_views: int = 4,
    width: int = 64,
    height: int = 64,
    n_verts: int = 300,
    seed: int = 0,
    n_poses: int = 1,
    radius: float = 3.0,
    capacity: int | None = None,
    raster_config: RasterizerConfig | None = None,
) -> SyntheticScene:
    rng = np.random.RandomState(seed)
    model = synthetic_smpl(num_vertices=n_verts, seed=seed)
    big = big_pose_params()
    verts, _ = smpl_forward(model, big["poses"], big["shapes"])
    verts = jnp.asarray(verts)
    center = np.asarray(jnp.mean(verts, axis=0))

    colors = rng.rand(n_verts, 3).astype(np.float32)
    normals = rng.randn(n_verts, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)

    gt_state = G.create_from_pcd(
        np.asarray(verts), colors, normals, capacity=capacity
    )
    # solid human: opacity 0.9 in the ground-truth scene
    cap = gt_state.capacity
    gt_state = gt_state._replace(
        params=gt_state.params._replace(
            opacity=jnp.full((cap, 1), float(inverse_sigmoid(0.9)))
        )
    )

    cfg = raster_config or RasterizerConfig(tile_capacity=512, chunk_tiles=16)
    big_jnp = {k: jnp.asarray(v) for k, v in big.items()}

    model_arrays = {
        "v_template": model.v_template,
        "shapedirs": model.shapedirs,
        "posedirs": model.posedirs,
        "j_regressor": model.j_regressor,
        "weights": model.weights,
    }

    @jax.jit
    def _gt_view(gt_state, model_arrays, cam, frame):
        """GT render + masks for one view, in ONE dispatch (eager per-op
        execution pays a tiny-program compile per op on remote backends).
        Scene state + SMPL tensors are arguments, not closures — closures
        embed as executable constants (slow compiles/cache loads)."""
        out = render_frame(
            gt_state, cam, frame, model._replace(**model_arrays),
            bg=jnp.zeros(3), active_sh_degree=0, config=cfg,
        )
        alpha = out.render_alpha
        bkgd = (alpha > 0.5).astype(jnp.float32)
        # bound mask: dilated person bbox (stand-in for the projected
        # SMPL box fill, dataset_readers.py:1288-1299)
        ys, xs = jnp.nonzero(alpha > 0.01, size=width * height,
                             fill_value=-1)
        valid = ys >= 0
        pad = 4
        y0 = jnp.maximum(jnp.min(jnp.where(valid, ys, height)) - pad, 0)
        y1 = jnp.minimum(jnp.max(jnp.where(valid, ys, 0)) + pad, height)
        x0 = jnp.maximum(jnp.min(jnp.where(valid, xs, width)) - pad, 0)
        x1 = jnp.minimum(jnp.max(jnp.where(valid, xs, 0)) + pad, width)
        yy = jnp.arange(height)[:, None]
        xx = jnp.arange(width)[None, :]
        bound = ((yy >= y0) & (yy <= y1) & (xx >= x0) & (xx <= x1))
        return (jax.lax.stop_gradient(out.render),
                jax.lax.stop_gradient(out.normal),
                bkgd, bound.astype(jnp.float32))

    batches = []
    for v in range(n_views):
        theta = 2 * np.pi * v / n_views
        eye = center + radius * np.array([np.sin(theta), 0.0, np.cos(theta)])
        cam = look_at_camera(eye, center, width, height)
        for p in range(n_poses):
            pose = (0.1 * rng.randn(72)).astype(np.float32) if n_poses > 1 or p > 0 \
                else np.zeros(72, np.float32)
            frame = FrameInputs(
                smpl_param={
                    "poses": jnp.asarray(pose),
                    "shapes": jnp.zeros(model.shapedirs.shape[-1]),
                    "R": jnp.eye(3),
                    "Th": jnp.zeros(3),
                },
                big_pose_param=big_jnp,
                big_pose_verts=verts,
            )
            gt_image, gt_normal, bkgd, bound = _gt_view(
                gt_state, model_arrays, cam, frame)
            batches.append(TrainBatch(
                camera=cam,
                frame=frame,
                gt_image=gt_image,
                gt_normal=gt_normal,
                bkgd_mask=bkgd,
                bound_mask=bound,
            ))

    # Training init: same geometry, gray colors, default opacity (0.1)
    init_state = G.create_from_pcd(
        np.asarray(verts),
        np.full((n_verts, 3), 0.5, np.float32),
        normals,
        capacity=capacity,
    )

    extent = float(np.linalg.norm(
        np.asarray(verts).max(0) - np.asarray(verts).min(0)
    )) * 0.5
    return SyntheticScene(
        smpl_model=model,
        gt_state=gt_state,
        init_state=init_state,
        batches=batches,
        big_pose_verts=verts,
        extent=extent,
        raster_config=cfg,
    )
