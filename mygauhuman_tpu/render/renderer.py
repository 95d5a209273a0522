"""Rendering orchestration: deform -> features -> ONE fused rasterize pass.

TPU-native re-design of `gaussian_renderer/__init__.py:53-295`. The reference
runs SEVEN rasterizer passes per frame with identical geometry and different
`colors_precomp` (rgb / normal / world_normal / albedo / occlusion /
roughness / axis, :203-272). Projection, binning, sorting and the blend
weights are identical across passes, so here all channels ride one blend as
feature columns (SURVEY.md §2.10 design note) — 19 channels + depth + alpha
in a single kernel launch instead of 7 full pipelines.

Per-channel parity notes (reference file:line):
  * rgb       = clamp(eval_sh(deg, features, viewdir) + 0.5, min=0)   (:192-195)
  * normal    = cam-space world_normal, y flipped, *0.5+0.5           (:166-169)
  * world_normal = *0.5+0.5                                           (:170)
  * albedo    = sigmoid(_albedo)                                      (:130, model :194-195)
  * occlusion = opacity.repeat(3) pre-bake; baked map after           (:143-165)
  * roughness = sigmoid(_roughness) (NOT the reference's albedo-read bug)
  * axis      = min-scale axis, viewer-flipped, cam-space, mapped     (:127-128,171-173)
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from mygauhuman_tpu.data.camera import Camera
from mygauhuman_tpu.models.gaussians import (
    GaussianParams,
    GaussianState,
    flip_align_view,
    get_albedo,
    get_covariance6,
    get_features,
    get_minimum_axis,
    get_opacity,
    get_roughness,
)
from mygauhuman_tpu.models.lbs import coarse_deform_c2source
from mygauhuman_tpu.models.mlps import apply_lbs_offset, apply_pose_refiner
from mygauhuman_tpu.models.smpl import SMPLModel
from mygauhuman_tpu.ops.rasterize import RasterizerConfig, rasterize
from mygauhuman_tpu.ops.sh import eval_sh_color
from mygauhuman_tpu.utils.transforms import normalize, rot_apply


class _Channels:
    """Fused feature-column layout. C = 19."""

    rgb = slice(0, 3)
    normal = slice(3, 6)
    world_normal = slice(6, 9)
    albedo = slice(9, 12)
    occlusion = slice(12, 15)
    roughness = slice(15, 16)
    axis = slice(16, 19)
    total = 19


CH = _Channels()


class FrameInputs(NamedTuple):
    """Per-frame pose data (from the dataset reader)."""

    smpl_param: Any          # dict: poses [72], shapes [B], R [3,3], Th [3]
    big_pose_param: Any      # dict for the canonical big pose
    big_pose_verts: jnp.ndarray   # [V, 3] canonical SMPL vertices


class RenderResult(NamedTuple):
    render: jnp.ndarray          # [H, W, 3]
    render_depth: jnp.ndarray    # [H, W]
    render_alpha: jnp.ndarray    # [H, W]
    normal: jnp.ndarray          # [H, W, 3] camera-space, mapped to [0,1]
    world_normal: jnp.ndarray    # [H, W, 3] mapped to [0,1]
    albedo: jnp.ndarray          # [H, W, 3]
    occlusion: jnp.ndarray       # [H, W, 3]
    roughness: jnp.ndarray       # [H, W]
    render_axis: jnp.ndarray     # [H, W, 3]
    radii: jnp.ndarray           # [cap] int32
    visibility_filter: jnp.ndarray   # [cap] bool (radii > 0)
    transforms: jnp.ndarray      # [cap, 3, 3] LBS rotations (eval replay)
    translation: jnp.ndarray     # [cap, 3]
    correct_Rs: jnp.ndarray | None
    overflow_tiles: jnp.ndarray  # binning truncation counters (scalars);
    overflow_gauss: jnp.ndarray  # logged every densify event, never silent
    overflow_inst: jnp.ndarray


def _pack_bg(bg_rgb: jnp.ndarray) -> jnp.ndarray:
    """Per-channel background. The reference reuses the same bg 3-vector for
    every pass (same GaussianRasterizationSettings, :67-89); scalar roughness
    gets its mean."""
    bg_rgb = bg_rgb.astype(jnp.float32)
    return jnp.concatenate(
        [bg_rgb, bg_rgb, bg_rgb, bg_rgb, bg_rgb, jnp.mean(bg_rgb)[None], bg_rgb]
    )


def render_frame(
    state: GaussianState,
    camera: Camera,
    frame: FrameInputs,
    smpl_model: SMPLModel,
    *,
    bg: jnp.ndarray,                      # [3]
    active_sh_degree: int,
    mlp_params: dict | None = None,       # {pose_refiner, lbs_offset}
    config: RasterizerConfig = RasterizerConfig(),
    means2d_offset: jnp.ndarray | None = None,
    occlusion_color: jnp.ndarray | None = None,   # [cap, 3] baked AO
    transforms: jnp.ndarray | None = None,        # eval replay (render.py:169-195)
    translation: jnp.ndarray | None = None,
    scaling_modifier: float = 1.0,
    raster_fn=None,    # rasterize-compatible; parallel/raster.py injects the
                       # tile-sharded strip pipeline here inside shard_map
) -> RenderResult:
    """Render one camera view of the articulated Gaussian human."""
    p: GaussianParams = state.params
    means_canonical = p.xyz
    correct_Rs = None

    if transforms is not None and translation is not None:
        # Eval fast path: replay cached per-pose LBS (skips MLPs + deform).
        # rot_apply = the einsum as a fused elementwise chain (batched
        # [N,3,3] dot_generals cost ~0.4 ms each at 64k in padded layouts)
        means3d = rot_apply(transforms, means_canonical) + translation
        world_normal = rot_apply(transforms, p.normal)
    else:
        lbs_offset = None
        if mlp_params is not None:
            pose_vec = frame.smpl_param["poses"].reshape(-1)[3:]
            correct_Rs = apply_pose_refiner(mlp_params["pose_refiner"], pose_vec)
            lbs_offset = apply_lbs_offset(
                mlp_params["lbs_offset"], jax.lax.stop_gradient(means_canonical)
            )
        deform = coarse_deform_c2source(
            smpl_model,
            means_canonical,
            frame.smpl_param,
            frame.big_pose_param,
            frame.big_pose_verts,
            lbs_offset=lbs_offset,
            correct_Rs=correct_Rs,
            normals=p.normal,
        )
        means3d = deform.world_pts
        world_normal = deform.world_normals
        transforms = deform.transforms
        translation = deform.translation

    viewdir = normalize(means3d - camera.cam_center[None, :])

    # Min-scale axis as pseudo-normal, flipped toward the viewer, then rotated
    # to world by the LBS transform (reference :127-128).
    axis = get_minimum_axis(p)
    axis, _ = flip_align_view(axis, viewdir)
    world_axis = normalize(rot_apply(transforms, axis))
    world_normal = normalize(world_normal)

    # Camera-space copies with y-flip, mapped to [0, 1] (reference :166-173).
    R_w2c = camera.w2c[:3, :3]
    def to_cam01(v):
        vc = v @ R_w2c.T
        vc = vc * jnp.array([1.0, -1.0, 1.0], jnp.float32)
        return vc * 0.5 + 0.5

    opacity = get_opacity(p)[:, 0]
    if occlusion_color is None:
        occlusion_color = jnp.repeat(opacity[:, None], 3, axis=1)

    # eval_sh wants [..., 3, coeffs] (reference transposes the same way,
    # gaussian_renderer/__init__.py:192-193).
    sh_coeffs = get_features(p).transpose(0, 2, 1)
    rgb = eval_sh_color(active_sh_degree, sh_coeffs, viewdir)

    features = jnp.concatenate(
        [
            rgb,
            to_cam01(world_normal),
            world_normal * 0.5 + 0.5,
            get_albedo(p),
            occlusion_color,
            get_roughness(p),
            to_cam01(world_axis),
        ],
        axis=1,
    )
    # Dead capacity slots can hold garbage; they never blend (alive-masked in
    # binning) but padded gather entries may still touch their rows — keep
    # those rows finite.
    features = jnp.where(state.alive[:, None], features, 0.0)

    cov6 = get_covariance6(p, scaling_modifier, transforms)
    if raster_fn is None:
        raster_fn = rasterize
    out = raster_fn(
        means3d,
        cov6,
        opacity,
        features,
        camera.w2c,
        camera.full_proj,
        _pack_bg(bg),
        width=camera.width,
        height=camera.height,
        tan_fovx=camera.tan_fovx,
        tan_fovy=camera.tan_fovy,
        config=config,
        means2d_offset=means2d_offset,
        alive=state.alive,
    )

    img = out.image
    return RenderResult(
        render=img[..., CH.rgb],
        render_depth=out.depth,
        render_alpha=out.alpha,
        normal=img[..., CH.normal],
        world_normal=img[..., CH.world_normal],
        albedo=img[..., CH.albedo],
        occlusion=img[..., CH.occlusion],
        roughness=img[..., CH.roughness][..., 0],
        render_axis=img[..., CH.axis],
        radii=out.radii,
        visibility_filter=out.radii > 0,
        transforms=transforms,
        translation=translation,
        correct_Rs=correct_Rs,
        overflow_tiles=out.overflow_tiles,
        overflow_gauss=out.overflow_gauss,
        overflow_inst=out.overflow_inst,
    )
