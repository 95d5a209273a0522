"""Split-sum image-based PBR shading (reference pbr/shade.py:105-213).

diffuse = irradiance(normal)^(1/2.2) * albedo * occlusion
specular = prefiltered_env(reflect_dir, mip(roughness)) * F0 * BRDF_LUT.x
with F0 = 0.04 (or metallic mix) — the gs-ir / nvdiffrec recipe.

The 256x256x2 BRDF LUT is COMPUTED here (Karis split-sum integration with a
Hammersley GGX sample set) instead of shipping the reference's opaque
`brdf_256_256.bin`; `get_brdf_lut` is cached after the first call.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mygauhuman_tpu.pbr.cubemap import (
    sample_2d,
    sample_2d_planar,
    sample_cubemap,
    sample_cubemap_mips,
    sample_cubemap_mips_planar,
    sample_cubemap_planar,
)
from mygauhuman_tpu.pbr.light import CubemapLight, get_mip


def saturate_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Parity: shade.py saturate_dot (clamp [1e-4, 1])."""
    return jnp.clip(jnp.sum(a * b, axis=-1, keepdims=True), 1e-4, 1.0)


def aces_film(rgb: jnp.ndarray) -> jnp.ndarray:
    """ACES filmic tone map (shade.py:33-44)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((rgb * (a * rgb + b)) / (rgb * (c * rgb + d) + e), 0.0, 1.0)


def linear_to_srgb(linear: jnp.ndarray) -> jnp.ndarray:
    """Parity: shade.py:47-60."""
    eps = jnp.finfo(jnp.float32).eps
    srgb0 = 323.0 / 25.0 * linear
    srgb1 = (211.0 * jnp.maximum(linear, eps) ** (5.0 / 12.0) - 11.0) / 200.0
    return jnp.where(linear <= 0.0031308, srgb0, srgb1)


def envBRDF_approx(roughness: jnp.ndarray, nov: jnp.ndarray) -> jnp.ndarray:
    """Lazarov analytic split-sum approximation (shade.py:15-25, unused by
    the training path but part of the API)."""
    c0 = jnp.array([-1.0, -0.0275, -0.572, 0.022])
    c1 = jnp.array([1.0, 0.0425, 1.04, -0.04])
    c2 = jnp.array([-1.04, 1.04])
    r = roughness * c0 + c1
    a004 = (
        jnp.minimum(r[..., 0:1] ** 2, jnp.exp2(-9.28 * nov)) * r[..., 0:1]
        + r[..., 1:2]
    )
    return jnp.clip(a004 * c2 + r[..., 2:], 0.0, 1.0)


# ----------------------------------------------------------------------------
# BRDF LUT: Karis split-sum (A, B) over (NoV, roughness)
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


def compute_brdf_lut(res: int = 256, n_samples: int = 1024) -> jnp.ndarray:
    """[res, res, 2] split-sum LUT: u = NoV, v = roughness.

    Karis split-sum integration: importance-sample GGX half-vectors and
    accumulate the Fresnel scale (A) and bias (B) factors with
    **height-correlated Smith** visibility — the convention the reference's
    shipped `pbr/brdf_256_256.bin` was generated with (verified numerically:
    mean |diff| 4.5e-4 / max 9e-3 at 2048 samples vs the binary, while the
    separable k=alpha/2 Karis-IBL G is off by 0.35 max). Oracle test:
    tests/test_oracles.py.
    """
    ham = _hammersley(n_samples)                       # [S, 2]
    nov = (np.arange(res) + 0.5) / res                 # u axis
    rough = (np.arange(res) + 0.5) / res               # v axis

    nov_g, rough_g = np.meshgrid(nov, rough, indexing="xy")   # [res(v), res(u)]
    nov_g = np.maximum(nov_g, 1e-4)
    V = np.stack([np.sqrt(1 - nov_g**2), np.zeros_like(nov_g), nov_g], axis=-1)
    alpha = np.maximum(rough_g * rough_g, 1e-4)
    a2 = alpha**2

    A = np.zeros_like(nov_g)
    B = np.zeros_like(nov_g)
    for xi1, xi2 in ham:
        phi = 2 * np.pi * xi1
        cos_th = np.sqrt((1 - xi2) / (1 + (a2 - 1) * xi2))
        sin_th = np.sqrt(np.maximum(1 - cos_th**2, 0))
        H = np.stack(
            [np.cos(phi) * sin_th, np.sin(phi) * sin_th, cos_th], axis=-1
        )
        L = 2 * np.sum(V * H, axis=-1, keepdims=True) * H - V
        nol = np.maximum(L[..., 2], 0.0)
        noh = np.maximum(H[..., 2], 0.0)
        voh = np.maximum(np.sum(V * H, axis=-1), 0.0)
        # height-correlated Smith GGX: G = 2 NoL NoV / (Λ_V + Λ_L)
        lam_v = nol * np.sqrt(nov_g**2 * (1 - a2) + a2)
        lam_l = nov_g * np.sqrt(nol**2 * (1 - a2) + a2)
        g = 2 * nol * nov_g / (lam_v + lam_l + 1e-9)
        g_vis = np.where(nol > 0, g * voh / (noh * nov_g + 1e-9), 0.0)
        fc = (1 - voh) ** 5
        A += (1 - fc) * g_vis
        B += fc * g_vis
    lut = np.stack([A, B], axis=-1) / n_samples
    return jnp.asarray(lut, jnp.float32)


@functools.lru_cache(maxsize=1)
def get_brdf_lut() -> jnp.ndarray:
    """[256, 256, 2]. Reference loads pbr/brdf_256_256.bin (shade.py:97-102);
    we integrate the identical quantity on the fly."""
    return compute_brdf_lut()


# ----------------------------------------------------------------------------
# Shading
# ----------------------------------------------------------------------------

def pbr_shading(
    light: CubemapLight,
    normals: jnp.ndarray,      # [H, W, 3] world, unit
    view_dirs: jnp.ndarray,    # [H, W, 3] surface -> camera, unit
    albedo: jnp.ndarray,       # [H, W, 3]
    roughness: jnp.ndarray,    # [H, W, 1]
    mask: jnp.ndarray,         # [H, W, 1]
    brdf_lut: jnp.ndarray,     # [256, 256, 2]
    occlusion: jnp.ndarray | None = None,   # [H, W, 1]
    metallic: jnp.ndarray | None = None,    # [H, W, 1]
    tone: bool = False,
    gamma: bool = False,
    background: jnp.ndarray | None = None,
) -> dict:
    """Split-sum IBL shading. Parity: pbr/shade.py:105-213 (incl. the
    diffuse^(1/2.2) gamma and the scale-only reflectance — the reference
    comments out the bias term fg_lookup[...,1:2])."""
    if background is None:
        background = jnp.zeros_like(normals)

    diffuse_map = jnp.clip(light.diffuse ** (1.0 / 2.2), 0.0, 1.0)

    ref_dirs = (
        2.0
        * jnp.clip(jnp.sum(normals * view_dirs, axis=-1, keepdims=True), 0.0,
                   None)
        * normals
        - view_dirs
    )

    diffuse_light = sample_cubemap(diffuse_map, normals)      # [H, W, 3]
    if occlusion is not None:
        diffuse_light = diffuse_light * occlusion
    diffuse_rgb = diffuse_light * albedo

    nov = saturate_dot(normals, view_dirs)                    # [H, W, 1]
    fg_uv = jnp.concatenate([nov, roughness], axis=-1)
    fg = sample_2d(brdf_lut, fg_uv)                           # [H, W, 2]

    n_levels = len(light.specular)
    mip = get_mip(roughness[..., 0], n_levels)
    spec = sample_cubemap_mips(list(light.specular), ref_dirs, mip)

    if metallic is None:
        f0 = jnp.full_like(albedo, 0.04)
    else:
        f0 = (1.0 - metallic) * 0.04 + albedo * metallic
    reflectance = f0 * fg[..., 0:1]   # scale term only (reference parity)
    specular_rgb = spec * reflectance

    render_rgb = diffuse_rgb + specular_rgb
    if tone:
        render_rgb = aces_film(render_rgb)
    else:
        render_rgb = jnp.clip(render_rgb, 0.0, 1.0)
    if gamma:
        render_rgb = linear_to_srgb(render_rgb)
    render_rgb = jnp.where(mask > 0, render_rgb, background)

    return {
        "render_rgb": render_rgb,
        "diffuse_rgb": diffuse_rgb,
        "specular_rgb": specular_rgb,
        "diffuse_light": diffuse_light,
    }


def pbr_shading_planar(
    light: CubemapLight,
    normals: tuple,            # 3 x [H, W] planes, world, unit
    view_dirs: tuple,          # 3 x [H, W] planes, surface -> camera, unit
    albedo: tuple,             # 3 x [H, W] planes
    roughness: jnp.ndarray,    # [H, W]
    mask: jnp.ndarray,         # [H, W]
    brdf_lut: jnp.ndarray,     # [256, 256, 2]
    occlusion: jnp.ndarray | None = None,   # [H, W]
    metallic: jnp.ndarray | None = None,    # [H, W]
    tone: bool = False,
    gamma: bool = False,
    background: tuple | None = None,        # 3 x [H, W]
) -> dict:
    """pbr_shading on channel-PLANAR images (tuples of [H, W] planes);
    identical math (tested vs pbr_shading to fp tolerance).

    Exists for the TPU train step: the rasterizer's G-buffers carry a
    channel-planar device layout, and the channel-minor sampling in
    pbr_shading makes XLA lay the gather outputs (and, transitively,
    their index chains) out transposed — the ~70x scalar gather path,
    ~46 ms of a 130 ms PBR step at 512^2 (PERF.md round-5 PBR anatomy).
    Here NOTHING carries a size-3 channel dimension — inputs, outputs,
    and all intermediate math are [H, W] planes (tuples, not stacked
    [3,H,W] arrays: a stacked array re-opens the same layout fight) —
    so every gather keeps natural-layout indices and outputs. Callers
    slice planes for free from the planar-layout G-buffers
    (`img[..., c]`) and pay ONE interleave of the final rgb for the
    channel-minor loss stack."""
    if background is None:
        background = (0.0, 0.0, 0.0)

    diffuse_map = jnp.clip(light.diffuse ** (1.0 / 2.2), 0.0, 1.0)

    nx, ny, nz = normals
    vx, vy, vz = view_dirs
    ndv = nx * vx + ny * vy + nz * vz                         # [H, W]
    two_ndv = 2.0 * jnp.clip(ndv, 0.0, None)
    rx = two_ndv * nx - vx
    ry = two_ndv * ny - vy
    rz = two_ndv * nz - vz

    diffuse_light = sample_cubemap_planar(diffuse_map, nx, ny, nz)
    if occlusion is not None:
        diffuse_light = tuple(d * occlusion for d in diffuse_light)
    diffuse_rgb = tuple(d * a for d, a in zip(diffuse_light, albedo))

    nov = jnp.clip(ndv, 1e-4, 1.0)
    fg0 = sample_2d_planar(brdf_lut, nov, roughness)[0]       # [H, W]

    n_levels = len(light.specular)
    mip = get_mip(roughness, n_levels)
    spec = sample_cubemap_mips_planar(list(light.specular), rx, ry, rz, mip)

    if metallic is None:
        f0 = (0.04, 0.04, 0.04)
    else:
        f0 = tuple((1.0 - metallic) * 0.04 + a * metallic for a in albedo)
    reflectance = tuple(f * fg0 for f in f0)
    specular_rgb = tuple(s * r for s, r in zip(spec, reflectance))

    render_rgb = tuple(d + s for d, s in zip(diffuse_rgb, specular_rgb))
    if tone:
        render_rgb = tuple(aces_film(c) for c in render_rgb)
    else:
        render_rgb = tuple(jnp.clip(c, 0.0, 1.0) for c in render_rgb)
    if gamma:
        render_rgb = tuple(linear_to_srgb(c) for c in render_rgb)
    render_rgb = tuple(
        jnp.where(mask > 0, c, bg) for c, bg in zip(render_rgb, background))

    return {
        "render_rgb": render_rgb,
        "diffuse_rgb": diffuse_rgb,
        "specular_rgb": specular_rgb,
        "diffuse_light": diffuse_light,
    }
