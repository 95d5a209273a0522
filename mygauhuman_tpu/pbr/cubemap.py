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


def dir_to_cube_uv_planar(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray):
    """dir_to_cube_uv on separate component PLANES ([H, W] each).

    The planar variants below exist for TPU layout reasons, not math:
    the fused 19-channel rasterizer emits channel-PLANAR G-buffers
    (layout major_to_minor=(2,0,1)), and a gather whose output XLA lays
    out planar (minor dim = the batch dim) lowers to the scalar path —
    measured ~2 ms per tap fusion at 512^2, ~100x the natural-layout
    gather (PERF.md round-5 PBR anatomy). Per-channel gathers from flat
    [6*R*R] tables keep every index and output a natural-layout [H, W]
    plane, which XLA lowers at full rate regardless of how the
    surrounding program is laid out."""
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    eps = 1e-12
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(
        is_x,
        jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    ).astype(jnp.int32)
    a = jnp.where(is_x, ax, jnp.where(is_y, ay, az)) + eps
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


def _bilinear_rows_matmul(tbl_rows: jnp.ndarray, r0, r1, x0, x1, tx, ty):
    """Bilinear sample via TWO one-hot contractions — zero gathers.

    tbl_rows [NR, R] is a row-major table (NR = 6*R for a cube face
    stack); r0/r1 [H, W] are the two row indices, x0/x1 the two column
    indices, tx/ty the bilinear fractions.

        rows[p, :] = (1-ty)*tbl[r0_p, :] + ty*tbl[r1_p, :]
                   = B @ tbl_rows,  B[p, r] = (1-ty_p)[r==r0_p] + ty_p[r==r1_p]
        out[p]     = sum_x rows[p, x] * ((1-tx_p)[x==x0_p] + tx_p[x==x1_p])

    The row mix is a [P, NR] @ [NR, R] MXU matmul (NR <= a few hundred
    for every table here), the column mix a [P, R] elementwise reduce.
    Why not gathers: XLA's TPU backend lowers the same small-table gather
    to a vectorized form in small programs but to a ~70x SCALAR path
    inside the big train step (measured: 2.1 ms per 512^2 tap, ~46 ms of
    a 130 ms PBR step — PERF.md round-5 PBR anatomy). A dot is a dot:
    this formulation cannot be demoted, and its AD transpose is another
    small matmul instead of a serialized scatter. Precision HIGHEST keeps
    f32-exact accumulation (parity tests at 2e-6)."""
    NR, R = tbl_rows.shape
    H, W = r0.shape
    P = H * W
    f = lambda a: a.reshape(P)  # noqa: E731
    iota_r = jnp.arange(NR, dtype=jnp.int32)
    wy = f(ty)[:, None]
    B = ((1.0 - wy) * (f(r0)[:, None] == iota_r)
         + wy * (f(r1)[:, None] == iota_r))
    # barrier: without it XLA output-fuses the one-hot construction INTO
    # the dot, demoting the MXU matmul to a ~60 ms semi-scalar loop
    # fusion (measured in the PBR step). Materializing B keeps the dot a
    # real dot.
    B = jax.lax.optimization_barrier(B)
    rows = jnp.matmul(B, tbl_rows, precision=jax.lax.Precision.HIGHEST)
    iota_c = jnp.arange(R, dtype=jnp.int32)
    wx = f(tx)[:, None]
    Cmix = ((1.0 - wx) * (f(x0)[:, None] == iota_c)
            + wx * (f(x1)[:, None] == iota_c))
    return jnp.sum(rows * Cmix, axis=-1).reshape(H, W)


def sample_cubemap_planar(cubemap: jnp.ndarray, x, y, z) -> tuple:
    """Bilinear cubemap lookup, planar: [6,R,R,C] x three [H,W] planes ->
    a tuple of C [H,W] planes. Identical math to sample_cubemap (tested).

    Returns a TUPLE, never a stacked [C,H,W]: a size-C dimension adjacent
    to the sampling math lets XLA's layout assignment propagate the
    G-buffers' planar layout into it (the original channel-minor path's
    failure mode). Sampling itself is matmul-based — see
    _bilinear_rows_matmul for why gathers are banned here."""
    R, C = cubemap.shape[1], cubemap.shape[-1]
    face, gx, gy = dir_to_cube_uv_planar(x, y, z)
    fx = (gx + 1.0) * 0.5 * R - 0.5
    fy = (gy + 1.0) * 0.5 * R - 0.5
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, R - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, R - 1)
    x1 = jnp.clip(x0 + 1, 0, R - 1)
    y1 = jnp.clip(y0 + 1, 0, R - 1)
    tx = jnp.clip(fx - x0, 0.0, 1.0)
    ty = jnp.clip(fy - y0, 0.0, 1.0)
    r0 = face * R + y0
    r1 = face * R + y1
    return tuple(
        _bilinear_rows_matmul(cubemap[..., c].reshape(6 * R, R),
                              r0, r1, x0, x1, tx, ty)
        for c in range(C)
    )


def sample_cubemap_mips_planar(mips, x, y, z, mip_level: jnp.ndarray) -> tuple:
    """Trilinear mip-chain lookup, planar: -> tuple of C [H,W] planes.

    The per-pixel level select is a masked SUM over the (small) mip count
    instead of take_along_axis — the general gather that op lowers to is
    exactly the slow path the planar rewrite removes."""
    n = len(mips)
    lvl = jnp.clip(mip_level, 0.0, n - 1.0)
    l0 = jnp.clip(jnp.floor(lvl).astype(jnp.int32), 0, n - 1)
    l1 = jnp.clip(l0 + 1, 0, n - 1)
    frac = lvl - l0.astype(jnp.float32)
    samples = [sample_cubemap_planar(m, x, y, z) for m in mips]
    C = len(samples[0])
    outs = []
    for c in range(C):
        s0 = sum((l0 == k).astype(jnp.float32) * samples[k][c]
                 for k in range(n))
        s1 = sum((l1 == k).astype(jnp.float32) * samples[k][c]
                 for k in range(n))
        outs.append(s0 * (1 - frac) + s1 * frac)
    return tuple(outs)


def sample_2d_planar(tex: jnp.ndarray, u: jnp.ndarray,
                     v: jnp.ndarray) -> tuple:
    """Bilinear 2D lookup, planar: tex [H',W',C], u/v [H,W] in [0,1] ->
    tuple of C [H,W] planes. Identical math to sample_2d (tested)."""
    Ht, Wt, C = tex.shape
    fx = u * Wt - 0.5
    fy = v * Ht - 0.5
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, Wt - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, Ht - 1)
    x1 = jnp.clip(x0 + 1, 0, Wt - 1)
    y1 = jnp.clip(y0 + 1, 0, Ht - 1)
    tx = jnp.clip(fx - x0, 0.0, 1.0)
    ty = jnp.clip(fy - y0, 0.0, 1.0)
    return tuple(
        _bilinear_rows_matmul(tex[..., c], y0, y1, x0, x1, tx, ty)
        for c in range(C)
    )


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
