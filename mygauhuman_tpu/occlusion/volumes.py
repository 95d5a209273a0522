"""SH occlusion / irradiance volumes — the gs-ir CUDA kernels in pure JAX.

Replaces (SURVEY.md §2.4):
  * trilinear_interpolate_coefficients fwd/bwd (irradiance_kernel.cu:11-130):
    plain differentiable gather + lerp (autodiff provides the scatter-add
    backward the reference hand-writes).
  * sparse_interpolate_coefficients (occlusion_kernel.cu:22-128): validity-
    masked trilinear interpolation over a sparse voxel-id grid.
  * SH_reconstruction (occlusion_kernel.cu:146-243): GGX-importance-sampled
    SH evaluation around the normal lobe (Hammersley sequence).
  * dialate_occlusion_ids (occlusion_kernel.cu:244+): nearest-neighbor fill.
  * IrradianceVolumes (gs_ir/volumes.py:217-261): learnable [R^3, d^2, C]
    SH grid.

`degree` follows the gs-ir convention: number of SH BANDS, i.e. degree^2
coefficients (degree=4 -> l in 0..3 -> 16 coeffs).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mygauhuman_tpu.ops.sh import C0, C1, C2, C3


def sh_components(degree: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Real SH basis values, bands l < degree: [..., degree^2].

    Parity: components_from_spherical_harmonics (gs_ir/volumes.py:9-86,
    duplicated utils/sh_utils.py:56-133).
    """
    assert 1 <= degree <= 4
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    comps = [jnp.full_like(x, C0)]
    if degree > 1:
        comps += [-C1 * y, C1 * z, -C1 * x]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        comps += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if degree > 3:
        comps += [
            C3[0] * y * (3 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4 * zz - xx - yy),
            C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            C3[4] * x * (4 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3 * yy),
        ]
    return jnp.stack(comps, axis=-1)


def reconstruct_envmap_from_sh(
    coefficients: jnp.ndarray,  # [..., d2, C]
    dirs: jnp.ndarray,          # [H, W, 3]
) -> jnp.ndarray:
    """Evaluate an SH-encoded envmap at directions -> [..., H, W, C].

    Parity: reconstruct_envmap_from_spherical_harmonics
    (gs_ir/volumes.py:89-150).
    """
    d2 = coefficients.shape[-2]
    degree = int(np.sqrt(d2))
    comps = sh_components(degree, dirs)               # [H, W, d2]
    return jnp.einsum("...dc,hwd->...hwc", coefficients, comps)


# ----------------------------------------------------------------------------
# Trilinear interpolation over dense / sparse grids
# ----------------------------------------------------------------------------

def _grid_corners(aabb: jnp.ndarray, res: int, points: jnp.ndarray):
    """Corner indices [N, 8, 3] and trilinear weights [N, 8] for points in
    an aabb = [min_xyz(3), max_xyz(3)] over a res^3 vertex grid."""
    lo, hi = aabb[:3], aabb[3:]
    cell = (hi - lo) / (res - 1)
    f = (points - lo) / cell
    i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, res - 2)
    t = jnp.clip(f - i0, 0.0, 1.0)                    # [N, 3]
    offs = jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
        jnp.int32,
    )                                                  # [8, 3]
    corners = i0[:, None, :] + offs[None, :, :]        # [N, 8, 3]
    w = jnp.prod(
        jnp.where(offs[None, :, :] == 1, t[:, None, :], 1.0 - t[:, None, :]),
        axis=-1,
    )                                                  # [N, 8]
    return corners, w


def trilinear_interpolate(
    grid: jnp.ndarray,    # [R, R, R, d2, C]
    aabb: jnp.ndarray,    # [6]
    points: jnp.ndarray,  # [N, 3]
) -> jnp.ndarray:
    """Differentiable dense-grid SH interpolation -> [N, d2, C]."""
    res = grid.shape[0]
    corners, w = _grid_corners(aabb, res, points)
    vals = grid[corners[..., 0], corners[..., 1], corners[..., 2]]  # [N,8,d2,C]
    return jnp.einsum("nk,nkdc->ndc", w, vals)


def sparse_interpolate_coefficients(
    coefficients: jnp.ndarray,   # [M, d2, C] per-voxel SH coefficients
    occlusion_ids: jnp.ndarray,  # [R, R, R] int32, -1 = empty
    aabb: jnp.ndarray,           # [6]
    points: jnp.ndarray,         # [N, 3]
) -> jnp.ndarray:
    """Validity-masked trilinear interp over a sparse voxel grid -> [N, d2, C].

    Empty corners (id < 0) are dropped and weights renormalized
    (occlusion_kernel.cu:22-128).
    """
    res = occlusion_ids.shape[0]
    corners, w = _grid_corners(aabb, res, points)
    ids = occlusion_ids[corners[..., 0], corners[..., 1], corners[..., 2]]
    valid = ids >= 0
    w = jnp.where(valid, w, 0.0)
    norm = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-8)
    w = w / norm
    vals = coefficients[jnp.maximum(ids, 0)]          # [N, 8, d2, C]
    return jnp.einsum("nk,nkdc->ndc", w, vals)


def dilate_occlusion_ids(ids: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """Fill empty (-1) voxels from their 6-neighborhood (max id wins).

    Parity: dialate_occlusion_ids (occlusion_kernel.cu:244+).
    """
    for _ in range(iterations):
        padded = jnp.pad(ids, 1, constant_values=-1)
        neigh = jnp.stack(
            [
                padded[:-2, 1:-1, 1:-1], padded[2:, 1:-1, 1:-1],
                padded[1:-1, :-2, 1:-1], padded[1:-1, 2:, 1:-1],
                padded[1:-1, 1:-1, :-2], padded[1:-1, 1:-1, 2:],
            ],
            axis=0,
        )
        fill = jnp.max(neigh, axis=0)
        ids = jnp.where(ids >= 0, ids, fill)
    return ids


# ----------------------------------------------------------------------------
# GGX-sampled SH reconstruction (occlusion_kernel.cu:146-243)
# ----------------------------------------------------------------------------

def _hammersley(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.uint32)
    bits = i.copy()
    bits = (bits << 16) | (bits >> 16)
    bits = ((bits & 0x55555555) << 1) | ((bits & 0xAAAAAAAA) >> 1)
    bits = ((bits & 0x33333333) << 2) | ((bits & 0xCCCCCCCC) >> 2)
    bits = ((bits & 0x0F0F0F0F) << 4) | ((bits & 0xF0F0F0F0) >> 4)
    bits = ((bits & 0x00FF00FF) << 8) | ((bits & 0xFF00FF00) >> 8)
    return np.stack([i / n, bits.astype(np.float64) * 2.3283064365386963e-10],
                    axis=1)


def sh_reconstruction(
    coefficients: jnp.ndarray,  # [N, d2, C]
    normals: jnp.ndarray,       # [N, 3]
    roughness: jnp.ndarray,     # [N, 1]
    sample_rays: int = 256,
    degree: int = 4,
) -> jnp.ndarray:
    """Average SH radiance over GGX-sampled directions around the normal
    lobe -> [N, C]."""
    ham = jnp.asarray(_hammersley(sample_rays), jnp.float32)   # [S, 2]
    alpha = jnp.clip(roughness, 1e-3, 1.0) ** 2                # [N, 1]

    phi = 2.0 * jnp.pi * ham[:, 0]                             # [S]
    xi2 = ham[:, 1]
    a2 = (alpha * alpha)[:, 0][:, None]                        # [N, 1]
    cos_t = jnp.sqrt((1.0 - xi2[None, :]) / (1.0 + (a2 - 1.0) * xi2[None, :]))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t**2, 0.0))         # [N, S]
    local = jnp.stack(
        [jnp.cos(phi)[None, :] * sin_t, jnp.sin(phi)[None, :] * sin_t, cos_t],
        axis=-1,
    )                                                           # [N, S, 3]

    # orthonormal basis around each normal
    n = normals
    up = jnp.where(jnp.abs(n[..., 2:3]) < 0.999,
                   jnp.asarray([0.0, 0.0, 1.0]),
                   jnp.asarray([1.0, 0.0, 0.0]))
    tang = jnp.cross(up, n)
    tang = tang / jnp.linalg.norm(tang, axis=-1, keepdims=True).clip(1e-12)
    bitang = jnp.cross(n, tang)
    dirs = (
        local[..., 0:1] * tang[:, None, :]
        + local[..., 1:2] * bitang[:, None, :]
        + local[..., 2:3] * n[:, None, :]
    )                                                           # [N, S, 3]

    comps = sh_components(degree, dirs)                         # [N, S, d2]
    vals = jnp.einsum("nsd,ndc->nsc", comps, coefficients)
    return jnp.mean(vals, axis=1)                               # [N, C]


def recon_occlusion(
    points: jnp.ndarray,                # [N, 3]
    normals: jnp.ndarray,               # [N, 3]
    occlusion_coefficients: jnp.ndarray,  # [M, d2, 1]
    occlusion_ids: jnp.ndarray,         # [R, R, R]
    aabb: jnp.ndarray,                  # [6]
    bound: float,
    sample_rays: int = 256,
    degree: int = 4,
) -> jnp.ndarray:
    """Per-point scalar ambient occlusion from the baked SH grid.

    Parity: recon_occlusion (gs_ir/__init__.py:6-41) — query points shifted
    half a grid cell along the normal, sparse interp, GGX SH reconstruction
    at roughness 1.
    """
    occlu_res = occlusion_ids.shape[0]
    half_grid = bound / float(occlu_res)
    shifted = points + normals * half_grid
    coeffs = sparse_interpolate_coefficients(
        occlusion_coefficients, occlusion_ids, aabb, shifted
    )                                                  # [N, d2, 1]
    rough = jnp.ones((points.shape[0], 1), jnp.float32)
    occ = sh_reconstruction(coeffs, normals, rough, sample_rays, degree)
    return jnp.clip(occ, 0.0, 1.0)


# ----------------------------------------------------------------------------
# Irradiance volumes (gs_ir/volumes.py:217-261)
# ----------------------------------------------------------------------------

class IrradianceVolumes(NamedTuple):
    coefficients: jnp.ndarray   # [R, R, R, degree^2, C] trainable
    aabb: jnp.ndarray           # [6] frozen


def init_irradiance_volumes(
    aabb, grid_res: int = 64, degree: int = 3, single_channel: bool = True
) -> IrradianceVolumes:
    c = 1 if single_channel else 3
    return IrradianceVolumes(
        coefficients=jnp.zeros((grid_res, grid_res, grid_res, degree**2, c),
                               jnp.float32),
        aabb=jnp.asarray(aabb, jnp.float32),
    )


def query_irradiance(
    vol: IrradianceVolumes,
    points: jnp.ndarray,   # [N, 3]
    normals: jnp.ndarray,  # [N, 3]
) -> jnp.ndarray:
    """Irradiance at surface points: SH grid interp x SH basis at the normal.

    Parity: IrradianceVolumes.query_irradiance (gs_ir/volumes.py:245-261).
    """
    d2 = vol.coefficients.shape[-2]
    degree = int(np.sqrt(d2))
    comps = jax.lax.stop_gradient(sh_components(degree, normals))  # [N, d2]
    coeffs = trilinear_interpolate(vol.coefficients, vol.aabb, points)
    return jnp.clip(jnp.einsum("ndc,nd->nc", coeffs, comps), 0.0, None)
