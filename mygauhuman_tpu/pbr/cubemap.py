"""Differentiable cubemap / 2D texture sampling — the nvdiffrast `dr.texture`
equivalent in pure JAX (SURVEY.md §2.6).

Face/uv convention matches the reference's `cube_to_dir`
(pbr/light.py:9-26, nvdiffrec order +x,-x,+y,-y,+z,-z):
    s0 (+x): d = ( 1, -gy, -gx)        s1 (-x): d = (-1, -gy,  gx)
    s2 (+y): d = (gx,   1,  gy)        s3 (-y): d = (gx,  -1, -gy)
    s4 (+z): d = (gx, -gy,   1)        s5 (-z): d = (-gx, -gy, -1)
with gx, gy in [-1, 1] at pixel centers linspace(-1+1/R, 1-1/R, R).

Bilinear filtering clamps at face edges (nvdiffrast's cube boundary blends
across faces; at the 16-32 px resolutions used here the difference is a
sub-texel ring, and gradients stay exact w.r.t. texels). Everything is
gather-based and differentiable w.r.t. the texture.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cube_to_dir(face: int, gx: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    one = jnp.ones_like(gx)
    if face == 0:
        v = (one, -gy, -gx)
    elif face == 1:
        v = (-one, -gy, gx)
    elif face == 2:
        v = (gx, one, gy)
    elif face == 3:
        v = (gx, -one, -gy)
    elif face == 4:
        v = (gx, -gy, one)
    else:
        v = (-gx, -gy, -one)
    return jnp.stack(v, axis=-1)


def dir_to_cube_uv(dirs: jnp.ndarray):
    """[..., 3] directions -> (face [...], gx [...], gy [...]) in [-1, 1]."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    eps = 1e-12

    # face selection: argmax of |component| with sign
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(
        is_x,
        jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    ).astype(jnp.int32)

    a = jnp.where(is_x, ax, jnp.where(is_y, ay, az)) + eps
    # per-face inverse of cube_to_dir
    gx = jnp.where(
        is_x,
        jnp.where(x >= 0, -z, z) / a,
        jnp.where(is_y, x / a, jnp.where(z >= 0, x, -x) / a),
    )
    gy = jnp.where(
        is_x,
        -y / a,
        jnp.where(is_y, jnp.where(y >= 0, z, -z) / a, -y / a),
    )
    return face, gx, gy


def face_grid(res: int):
    """Pixel-center (gx, gy) grids, each [res, res] (gy rows, gx cols)."""
    lin = jnp.linspace(-1.0 + 1.0 / res, 1.0 - 1.0 / res, res)
    gy, gx = jnp.meshgrid(lin, lin, indexing="ij")
    return gx, gy


def face_directions(res: int) -> jnp.ndarray:
    """Unit direction of every texel: [6, res, res, 3]."""
    gx, gy = face_grid(res)
    dirs = jnp.stack([cube_to_dir(s, gx, gy) for s in range(6)], axis=0)
    return dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)


def texel_solid_angles(res: int) -> jnp.ndarray:
    """Solid angle of every texel: [6, res, res].

    For cube face point (gx, gy): domega = 4 / (res^2 * (gx^2+gy^2+1)^1.5).
    """
    gx, gy = face_grid(res)
    w = 4.0 / (res * res * (gx * gx + gy * gy + 1.0) ** 1.5)
    return jnp.broadcast_to(w, (6, res, res))


def sample_cubemap(cubemap: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear cubemap lookup. cubemap [6, R, R, C], dirs [..., 3] -> [..., C]."""
    R = cubemap.shape[1]
    face, gx, gy = dir_to_cube_uv(dirs)
    # pixel-space coords: gx = -1+1/R  ->  0 ; gx = 1-1/R -> R-1
    fx = (gx + 1.0) * 0.5 * R - 0.5
    fy = (gy + 1.0) * 0.5 * R - 0.5
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, R - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, R - 1)
    x1 = jnp.clip(x0 + 1, 0, R - 1)
    y1 = jnp.clip(y0 + 1, 0, R - 1)
    tx = jnp.clip(fx - x0, 0.0, 1.0)[..., None]
    ty = jnp.clip(fy - y0, 0.0, 1.0)[..., None]

    c00 = cubemap[face, y0, x0]
    c01 = cubemap[face, y0, x1]
    c10 = cubemap[face, y1, x0]
    c11 = cubemap[face, y1, x1]
    top = c00 * (1 - tx) + c01 * tx
    bot = c10 * (1 - tx) + c11 * tx
    return top * (1 - ty) + bot * ty


def sample_cubemap_mips(
    mips: list[jnp.ndarray], dirs: jnp.ndarray, mip_level: jnp.ndarray
) -> jnp.ndarray:
    """Trilinear (linear-mipmap-linear) lookup across a mip chain.

    Parity: dr.texture(..., mip=..., mip_level_bias=..., filter_mode=
    "linear-mipmap-linear") in pbr_shading (pbr/shade.py:170-180).
    """
    n = len(mips)
    lvl = jnp.clip(mip_level, 0.0, n - 1.0)
    l0 = jnp.clip(jnp.floor(lvl).astype(jnp.int32), 0, n - 1)
    frac = (lvl - l0.astype(jnp.float32))[..., None]
    samples = jnp.stack([sample_cubemap(m, dirs) for m in mips], axis=0)
    s0 = jnp.take_along_axis(
        samples, l0[None, ..., None].astype(jnp.int32), axis=0
    )[0]
    l1 = jnp.clip(l0 + 1, 0, n - 1)
    s1 = jnp.take_along_axis(
        samples, l1[None, ..., None].astype(jnp.int32), axis=0
    )[0]
    return s0 * (1 - frac) + s1 * frac


def sample_2d(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2D lookup with clamp boundary. tex [H, W, C], uv [..., 2] in
    [0, 1] (u -> W, v -> H). Parity: dr.texture(boundary_mode="clamp")."""
    H, W = tex.shape[0], tex.shape[1]
    fx = uv[..., 0] * W - 0.5
    fy = uv[..., 1] * H - 0.5
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    tx = jnp.clip(fx - x0, 0.0, 1.0)[..., None]
    ty = jnp.clip(fy - y0, 0.0, 1.0)[..., None]
    top = tex[y0, x0] * (1 - tx) + tex[y0, x1] * tx
    bot = tex[y1, x0] * (1 - tx) + tex[y1, x1] * tx
    return top * (1 - ty) + bot * ty


def latlong_dirs(height: int, width: int) -> jnp.ndarray:
    """Lat-long pixel directions [H, W, 3].

    Parity: export_envmap (pbr/light.py:124-135): theta = v*pi over [0,1],
    phi = u*pi over [-1,1]; dir = (sin t sin p, cos t, -sin t cos p).
    """
    gy = jnp.linspace(0.0, 1.0, height)[:, None]
    gx = jnp.linspace(-1.0, 1.0, width)[None, :]
    sin_t, cos_t = jnp.sin(gy * jnp.pi), jnp.cos(gy * jnp.pi)
    sin_p, cos_p = jnp.sin(gx * jnp.pi), jnp.cos(gx * jnp.pi)
    return jnp.stack(
        [
            jnp.broadcast_to(sin_t * sin_p, (height, width)),
            jnp.broadcast_to(cos_t, (height, width)),
            jnp.broadcast_to(-sin_t * cos_p, (height, width)),
        ],
        axis=-1,
    )


def cubemap_to_latlong(cubemap: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    return sample_cubemap(cubemap, latlong_dirs(height, width))


def latlong_to_cubemap(latlong: jnp.ndarray, res: int) -> jnp.ndarray:
    """Inverse mapping for loading novel HDR lights (render.py:74-94 path)."""
    dirs = face_directions(res)                       # [6, R, R, 3]
    # invert latlong_dirs: theta = acos(y), phi = atan2(x, -z)
    y = jnp.clip(dirs[..., 1], -1.0, 1.0)
    theta = jnp.arccos(y) / jnp.pi                    # [0, 1] -> v
    phi = jnp.arctan2(dirs[..., 0], -dirs[..., 2]) / jnp.pi   # [-1, 1] -> u
    uv = jnp.stack([(phi + 1.0) * 0.5, theta], axis=-1)
    return sample_2d(latlong, uv)


def avg_pool_cubemap(cubemap: jnp.ndarray) -> jnp.ndarray:
    """2x2 average-pool mip reduction [6,R,R,C] -> [6,R/2,R/2,C].

    Parity: cubemap_mip.forward (pbr/light.py:30-36).
    """
    f, R, _, C = cubemap.shape
    x = cubemap.reshape(f, R // 2, 2, R // 2, 2, C)
    return jnp.mean(x, axis=(2, 4))
