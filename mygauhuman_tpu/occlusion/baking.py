"""Ambient-occlusion baking: per-voxel opacity cubemaps via the rasterizer.

TPU-native re-derivation of the reference `baking.py:136-309` (`bake_set`):
voxelize the posed Gaussians into a res^3 occupancy grid; from each occupied
cell center render SIX 32x32 opacity-only views (fov 90) of all Gaussians
OUTSIDE the cell; convert the opacity cubemap to a small lat-long visibility
map; every Gaussian inherits its cell's map, masked by the normal hemisphere
(dot(envdir, normal) > 0).

Static-shape design: the reference loops Python-side over a dynamic list of
occupied cells with boolean tensor cropping; here a fixed `max_cells` budget
of cells is processed under `lax.map` (occupied cells ranked first), and the
"all other Gaussians" crop is the rasterizer's alive-mask with the cell's
members cleared — no dynamic shapes anywhere.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mygauhuman_tpu.data.camera import projection_from_fov
from mygauhuman_tpu.ops.rasterize import RasterizerConfig, rasterize
from mygauhuman_tpu.pbr.cubemap import cube_to_dir, dir_to_cube_uv, latlong_dirs


class VoxelGrid(NamedTuple):
    cell_of_point: jnp.ndarray   # [N] int32 flat cell index
    centers: jnp.ndarray         # [res^3, 3] cell centers
    occupied: jnp.ndarray        # [res^3] bool


def pc_to_grid(points: jnp.ndarray, alive: jnp.ndarray, res: int = 10) -> VoxelGrid:
    """Voxelize points into a res^3 grid over their bounding box.

    Parity: pc_to_grid (baking.py:104-134) — floor((p - min)/cell), clamped.
    """
    masked = jnp.where(alive[:, None], points, jnp.nan)
    lo = jnp.nanmin(masked, axis=0)
    hi = jnp.nanmax(masked, axis=0)
    cell = (hi - lo) / res
    idx = jnp.clip(
        jnp.floor((points - lo) / jnp.maximum(cell, 1e-12)).astype(jnp.int32),
        0, res - 1,
    )
    flat = idx[:, 0] * res * res + idx[:, 1] * res + idx[:, 2]
    flat = jnp.where(alive, flat, res**3 - 1)

    ijk = jnp.stack(
        jnp.meshgrid(jnp.arange(res), jnp.arange(res), jnp.arange(res),
                     indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    centers = lo[None, :] + (ijk + 0.5) * cell[None, :]
    occupied = jnp.zeros((res**3,), bool).at[
        jnp.where(alive, flat, res**3)
    ].set(True, mode="drop")
    return VoxelGrid(cell_of_point=flat, centers=centers, occupied=occupied)


def _face_camera_axes(face: int):
    """c2w axes (right, down, forward) so the rendered image IS the cubemap
    face in our sampling convention (pbr/cubemap.py cube_to_dir): right =
    d(dir)/d(gx), down = d(dir)/d(gy), forward = dir(0, 0)."""
    table = {  # numpy mirror of cube_to_dir (pbr/cubemap.py)
        0: lambda gx, gy: np.array([1.0, -gy, -gx]),
        1: lambda gx, gy: np.array([-1.0, -gy, gx]),
        2: lambda gx, gy: np.array([gx, 1.0, gy]),
        3: lambda gx, gy: np.array([gx, -1.0, -gy]),
        4: lambda gx, gy: np.array([gx, -gy, 1.0]),
        5: lambda gx, gy: np.array([-gx, -gy, -1.0]),
    }
    d = table[face]
    fwd = d(0.0, 0.0)
    right = d(1.0, 0.0) - fwd
    down = d(0.0, 1.0) - fwd
    return right, down, fwd


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "grid_res", "max_cells", "face_res",
                     "config"),
)
def bake_occlusion(
    means3d: jnp.ndarray,     # [cap, 3] posed world positions
    cov3d6: jnp.ndarray,      # [cap, 6] world covariances
    opacities: jnp.ndarray,   # [cap]
    world_normals: jnp.ndarray,  # [cap, 3] unit
    alive: jnp.ndarray,       # [cap] bool
    *,
    height: int = 16,
    width: int = 32,
    grid_res: int = 10,
    max_cells: int = 128,
    face_res: int = 32,
    config: RasterizerConfig = RasterizerConfig(
        tile_capacity=256, chunk_tiles=4, max_tiles_per_gaussian=4
    ),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-Gaussian [cap, H, W, 1] visibility (1 - occluder opacity), masked
    by the normal hemisphere, plus an `out_of_budget` count: alive Gaussians
    whose voxel fell beyond the max_cells budget and therefore got full
    visibility 1.0 (counted, never silent — callers log it). Run under
    stop_gradient by callers (the reference bakes under no_grad,
    baking.py:230)."""
    cap = means3d.shape[0]
    grid = pc_to_grid(means3d, alive, grid_res)

    # rank occupied cells first; process a static max_cells budget
    order = jnp.argsort(~grid.occupied)           # occupied first, stable
    cells = order[:max_cells]                     # [max_cells]
    cell_live = grid.occupied[cells]

    env_dirs = latlong_dirs(height, width)        # [H, W, 3]

    # 6 fixed cameras (fov 90 -> tan = 1)
    proj = jnp.asarray(projection_from_fov(0.01, 100.0, np.pi / 2, np.pi / 2))
    axes = [_face_camera_axes(s) for s in range(6)]

    def render_cell(cell_id):
        center = grid.centers[cell_id]
        members = grid.cell_of_point == cell_id
        mask = alive & ~members

        faces = []
        for right, down, fwd in axes:
            R_c2w = jnp.stack(
                [jnp.asarray(right, jnp.float32),
                 jnp.asarray(down, jnp.float32),
                 jnp.asarray(fwd, jnp.float32)], axis=1
            )
            w2c = jnp.zeros((4, 4), jnp.float32)
            w2c = w2c.at[:3, :3].set(R_c2w.T)
            w2c = w2c.at[:3, 3].set(-(R_c2w.T @ center))
            w2c = w2c.at[3, 3].set(1.0)
            full = proj @ w2c
            out = rasterize(
                means3d,
                cov3d6,
                opacities,
                jnp.zeros((cap, 1), jnp.float32),
                w2c,
                full,
                jnp.zeros((1,), jnp.float32),
                width=face_res,
                height=face_res,
                tan_fovx=1.0,
                tan_fovy=1.0,
                config=config,
                alive=mask,
            )
            faces.append(out.alpha)               # [res, res]
        cubemap = jnp.stack(faces, axis=0)[..., None]   # [6, r, r, 1]
        # nearest-neighbor latlong lookup (baking.py:290-298 filter "nearest")
        face, gx, gy = dir_to_cube_uv(env_dirs)
        r = face_res
        xi = jnp.clip(((gx + 1.0) * 0.5 * r).astype(jnp.int32), 0, r - 1)
        yi = jnp.clip(((gy + 1.0) * 0.5 * r).astype(jnp.int32), 0, r - 1)
        return cubemap[face, yi, xi]              # [H, W, 1]

    opacity_envs = jax.lax.map(render_cell, cells)      # [max_cells, H, W, 1]
    visibility = jnp.where(cell_live[:, None, None, None],
                           1.0 - opacity_envs, 0.0)

    # scatter back: every gaussian inherits its cell's map
    cell_rank = jnp.full((grid_res**3,), max_cells, jnp.int32)
    cell_rank = cell_rank.at[cells].set(jnp.arange(max_cells, dtype=jnp.int32))
    gauss_rank = cell_rank[grid.cell_of_point]          # [cap]
    in_budget = gauss_rank < max_cells
    vis = jnp.where(
        in_budget[:, None, None, None],
        visibility[jnp.clip(gauss_rank, 0, max_cells - 1)],
        1.0,
    )
    out_of_budget = jnp.sum(alive & ~in_budget).astype(jnp.int32)
    dot_mask = (
        jnp.einsum("hwc,nc->nhw", env_dirs, world_normals)[..., None] > 0
    )
    vis = jnp.where(dot_mask, vis, 0.0) * alive[:, None, None, None]
    return vis, out_of_budget


def occlusion_color(
    occlusion: jnp.ndarray,   # [cap, H, W, 1]
    envmap: jnp.ndarray | None = None,   # [H, W, 3] grayscale light
) -> jnp.ndarray:
    """Reduce a per-Gaussian occlusion envmap to the 3-channel color fed to
    the rasterizer's occlusion channels (gaussian_renderer/__init__.py:152-165).
    """
    if envmap is None:
        s = jnp.sum(occlusion, axis=(1, 2))             # [cap, 1]
    else:
        occ = jnp.clip(occlusion, 0.0, 1.0) * envmap[None]
        s = jnp.clip(jnp.sum(occ, axis=(1, 2)), 0.0, 3.0)
        s = jnp.mean(s, axis=-1, keepdims=True)
        s = jnp.clip(s, 0.0, 1.0)
    return jnp.repeat(s, 3, axis=-1)
