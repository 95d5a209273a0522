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

Full coverage (reference parity — `baking.py:145-202` bakes EVERY occupied
cell): the cell window's start is a *traced* offset into the ranked cell
order, so `bake_occlusion_full` sweeps all occupied cells with repeated
calls of ONE jitted program (`ceil(n_occupied / sweep_cells)` dispatches,
one tiny host sync for the occupied-cell count). `bake_occlusion` remains
the single-sweep form with a counted out-of-budget remainder.
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


@functools.partial(jax.jit, static_argnames=("grid_res",))
def count_occupied(
    points: jnp.ndarray, alive: jnp.ndarray, grid_res: int = 10
) -> jnp.ndarray:
    """Number of occupied voxels — drives the sweep count in
    `bake_occlusion_full` (the reference's per-nonempty-cell loop bound,
    baking.py:145)."""
    return jnp.sum(pc_to_grid(points, alive, grid_res).occupied)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "grid_res", "max_cells", "face_res",
                     "config"),
)
def _bake_sweep(
    means3d: jnp.ndarray,     # [cap, 3] posed world positions
    cov3d6: jnp.ndarray,      # [cap, 6] world covariances
    opacities: jnp.ndarray,   # [cap]
    alive: jnp.ndarray,       # [cap] bool
    vis_carry: jnp.ndarray,   # [cap, H, W, 1] raw visibility accumulator
    offset,                   # traced int32: start into the ranked cell order
    *,
    height: int,
    width: int,
    grid_res: int,
    max_cells: int,
    face_res: int,
    config: RasterizerConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Bake the cells ranked [offset, offset+max_cells) and merge their
    visibility maps into `vis_carry` (un-masked: hemisphere/alive masking is
    applied once by `_finalize`). Returns (vis, n_uncovered) where
    n_uncovered counts alive Gaussians whose cell ranks past the window end
    — zero once the sweeps have covered every occupied cell. The offset is
    traced, so every sweep reuses one compiled program."""
    cap = means3d.shape[0]
    grid = pc_to_grid(means3d, alive, grid_res)
    res3 = grid_res ** 3

    # rank occupied cells first; bake a static max_cells window of the order
    order = jnp.argsort(~grid.occupied)           # occupied first, stable
    rank = jnp.zeros((res3,), jnp.int32).at[order].set(
        jnp.arange(res3, dtype=jnp.int32)
    )
    # dynamic_slice clamps the start; use the clamped value for membership
    off = jnp.minimum(
        jnp.asarray(offset, jnp.int32), jnp.int32(res3 - max_cells)
    )
    off = jnp.maximum(off, 0)
    cells = jax.lax.dynamic_slice(order, (off,), (max_cells,))
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

    # scatter back: every gaussian in a window cell inherits its cell's map
    g_rank = rank[grid.cell_of_point]                   # [cap]
    local = jnp.clip(g_rank - off, 0, max_cells - 1)
    in_window = (
        (g_rank >= off) & (g_rank < off + max_cells) & cell_live[local]
    )
    vis = jnp.where(
        in_window[:, None, None, None],
        1.0 - opacity_envs[local],
        vis_carry,
    )
    # alive Gaussians always map to occupied (i.e. low-ranked) cells, so
    # anything ranking past the window end is still uncovered
    n_uncovered = jnp.sum(alive & (g_rank >= off + max_cells)).astype(
        jnp.int32
    )
    return vis, n_uncovered


@functools.partial(jax.jit, static_argnames=("height", "width"))
def _finalize(
    vis: jnp.ndarray,            # [cap, H, W, 1] raw visibility
    world_normals: jnp.ndarray,  # [cap, 3] unit
    alive: jnp.ndarray,          # [cap] bool
    height: int,
    width: int,
) -> jnp.ndarray:
    """Normal-hemisphere mask (dot_map, reference baking.py:232,307) and
    alive mask, applied once after all sweeps."""
    env_dirs = latlong_dirs(height, width)
    dot_mask = (
        jnp.einsum("hwc,nc->nhw", env_dirs, world_normals)[..., None] > 0
    )
    return jnp.where(dot_mask, vis, 0.0) * alive[:, None, None, None]


_DEFAULT_BAKE_CONFIG = RasterizerConfig(
    tile_capacity=256, chunk_tiles=4, max_tiles_per_gaussian=4
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
    config: RasterizerConfig = _DEFAULT_BAKE_CONFIG,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-sweep bake: per-Gaussian [cap, H, W, 1] visibility
    (1 - occluder opacity), masked by the normal hemisphere, plus an
    `out_of_budget` count: alive Gaussians whose voxel fell beyond the
    max_cells budget and therefore got full visibility 1.0 (counted, never
    silent — callers log it). For reference-parity full coverage use
    `bake_occlusion_full`. Run under stop_gradient by callers (the
    reference bakes under no_grad, baking.py:230)."""
    max_cells = min(max_cells, grid_res ** 3)
    cap = means3d.shape[0]
    vis0 = jnp.ones((cap, height, width, 1), jnp.float32)
    vis, oob = _bake_sweep(
        means3d, cov3d6, opacities, alive, vis0, jnp.int32(0),
        height=height, width=width, grid_res=grid_res, max_cells=max_cells,
        face_res=face_res, config=config,
    )
    return _finalize(vis, world_normals, alive, height, width), oob


def bake_occlusion_full(
    means3d: jnp.ndarray,
    cov3d6: jnp.ndarray,
    opacities: jnp.ndarray,
    world_normals: jnp.ndarray,
    alive: jnp.ndarray,
    *,
    height: int = 16,
    width: int = 32,
    grid_res: int = 10,
    sweep_cells: int = 128,
    face_res: int = 32,
    config: RasterizerConfig = _DEFAULT_BAKE_CONFIG,
) -> tuple[jnp.ndarray, jnp.ndarray, int]:
    """Full-coverage bake (reference parity: every occupied voxel gets an
    opacity cubemap, baking.py:145-202): sweeps the ranked cell order in
    `sweep_cells`-sized windows until all occupied cells are baked. All
    sweeps share ONE jitted program (the window offset is traced); the only
    host sync is the occupied-cell count. Returns (vis, out_of_budget,
    n_sweeps) — out_of_budget is 0 by construction."""
    sweep_cells = min(sweep_cells, grid_res ** 3)
    n_occ = int(count_occupied(means3d, alive, grid_res))
    cap = means3d.shape[0]
    vis = jnp.ones((cap, height, width, 1), jnp.float32)
    oob = jnp.zeros((), jnp.int32)
    n_sweeps = max(1, -(-n_occ // sweep_cells))
    for s in range(n_sweeps):
        vis, oob = _bake_sweep(
            means3d, cov3d6, opacities, alive, vis,
            jnp.int32(s * sweep_cells),
            height=height, width=width, grid_res=grid_res,
            max_cells=sweep_cells, face_res=face_res, config=config,
        )
    return (
        _finalize(vis, world_normals, alive, height, width),
        oob,
        n_sweeps,
    )


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
