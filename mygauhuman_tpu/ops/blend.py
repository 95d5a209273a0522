"""Per-tile front-to-back alpha blending — vectorized, differentiable, fp32.

The reference's per-pixel sequential loop with early termination
(forward.cu:261-383) is re-derived as a masked cumulative product, which is
the TPU-native form (VPU cumsum + one MXU matmul per tile, no serial pixel
state, plain `jax.grad` backward with deterministic scatter-add — replacing
the CUDA suffix-replay + atomicAdd backward, backward.cu:399-587):

  alpha_i  = min(0.99, op_i * exp(power_i)),  power_i <= 0, alpha_i >= 1/255
  T_i      = prod_{j<i, valid_j} (1 - alpha_j)          (exclusive cumprod)
  include_i = valid_i AND T_i * (1 - alpha_i) >= 1e-4

The early-termination parity argument: T is monotone non-increasing, so the
first valid i with T_i*(1-alpha_i) < 1e-4 — where the CUDA loop sets
`done` — also kills every later valid j (T_j <= T_i*(1-alpha_i)). Hence
include_i computed from the *full* cumprod equals the sequential decision,
and for included i all prior valid j are included, so T_i is exactly the
sequential transmittance. No n_contrib bookkeeping needed.

Blend (one fused multi-channel pass — the reference's 7 rasterizer calls
with shared geometry, gaussian_renderer/__init__.py:203-272, become extra
feature columns riding the same weights):

  w_i      = include_i * alpha_i * T_i
  color    = sum_i w_i * feat_i + T_final * bg     (T_final = prod over included)
  depth    = sum_i w_i * depth_i
  out_alpha= sum_i w_i        (NOT 1 - T_final; parity forward.cu:380)
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class BlendOutput(NamedTuple):
    image: jnp.ndarray     # [H, W, C]
    alpha: jnp.ndarray     # [H, W]
    depth: jnp.ndarray     # [H, W]
    final_t: jnp.ndarray   # [H, W]


def _blend_tile_chunk(
    tile_origin_xy: jnp.ndarray,   # [B, 2] float32 (x0, y0) pixel origin per tile
    idx: jnp.ndarray,              # [B, K] int32
    valid: jnp.ndarray,            # [B, K] bool
    means2d: jnp.ndarray,          # [N, 2]
    conics: jnp.ndarray,           # [N, 3]
    opacities: jnp.ndarray,        # [N]
    features: jnp.ndarray,         # [N, C]
    depths: jnp.ndarray,           # [N]
    bg: jnp.ndarray,               # [C]
    tile_w: int,
    tile_h: int,
):
    """Blend a chunk of B tiles. Returns per-tile [B, P, C+...] maps."""
    B, K = idx.shape
    P = tile_w * tile_h

    # Gather per-instance data: [B, K, ...]
    xy = means2d[idx]
    con = conics[idx]
    op = opacities[idx]
    feat = features[idx]
    dep = depths[idx]

    # Pixel centers, row-major within the tile: [B, P]
    px = tile_origin_xy[:, 0:1] + jnp.tile(
        jnp.arange(tile_w, dtype=jnp.float32), tile_h
    )[None, :]
    py = tile_origin_xy[:, 1:2] + jnp.repeat(
        jnp.arange(tile_h, dtype=jnp.float32), tile_w
    )[None, :]

    dx = xy[..., 0:1] - px[:, None, :]        # [B, K, P]
    dy = xy[..., 1:2] - py[:, None, :]
    power = (
        -0.5 * (con[..., 0:1] * dx * dx + con[..., 2:3] * dy * dy)
        - con[..., 1:2] * dx * dy
    )
    alpha = jnp.minimum(0.99, op[..., None] * jnp.exp(power))
    ok = valid[..., None] & (power <= 0.0) & (alpha >= (1.0 / 255.0))
    a = jnp.where(ok, alpha, 0.0)

    # Exclusive transmittance via log-space cumsum along K (front-to-back).
    l1ma = jnp.log1p(-a)
    cum = jnp.cumsum(l1ma, axis=1)
    t_after = jnp.exp(cum)                     # T_{i+1} = T_i * (1 - a_i)
    t_before = jnp.exp(cum - l1ma)
    include = ok & (t_after >= 1e-4)
    w = jnp.where(include, a * t_before, 0.0)  # [B, K, P]

    # MXU: [B, P, K] @ [B, K, C]
    color = jnp.einsum("bkp,bkc->bpc", w, feat, preferred_element_type=jnp.float32)
    depth = jnp.einsum("bkp,bk->bp", w, dep, preferred_element_type=jnp.float32)
    out_alpha = jnp.sum(w, axis=1)             # [B, P]
    final_t = jnp.exp(jnp.sum(jnp.where(include, l1ma, 0.0), axis=1))  # [B, P]

    color = color + final_t[..., None] * bg[None, None, :]
    return color, out_alpha, depth, final_t


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_w", "tile_h", "chunk_tiles"),
)
def blend(
    tile_idx: jnp.ndarray,
    tile_valid: jnp.ndarray,
    means2d: jnp.ndarray,
    conics: jnp.ndarray,
    opacities: jnp.ndarray,
    features: jnp.ndarray,
    depths: jnp.ndarray,
    bg: jnp.ndarray,
    *,
    width: int,
    height: int,
    tile_w: int = 16,
    tile_h: int = 16,
    chunk_tiles: int = 64,
) -> BlendOutput:
    """Blend all tiles and assemble the image.

    The tile loop runs as `lax.map` over chunks so the [B, K, P] alpha tensor
    never exceeds chunk_tiles*K*P floats; autodiff rematerializes per chunk.
    """
    tw = -(-width // tile_w)
    th = -(-height // tile_h)
    T = tw * th
    assert tile_idx.shape[0] == T, (tile_idx.shape, T)
    C = features.shape[-1]

    means2d = means2d.astype(jnp.float32)
    conics = conics.astype(jnp.float32)
    opacities = opacities.astype(jnp.float32)
    features = features.astype(jnp.float32)
    depths = depths.astype(jnp.float32)
    bg = bg.astype(jnp.float32)

    tid = jnp.arange(T, dtype=jnp.int32)
    origin = jnp.stack(
        [(tid % tw) * tile_w, (tid // tw) * tile_h], axis=-1
    ).astype(jnp.float32)

    B = min(chunk_tiles, T)
    pad = (-T) % B
    if pad:
        tile_idx = jnp.concatenate([tile_idx, jnp.zeros((pad,) + tile_idx.shape[1:], tile_idx.dtype)])
        tile_valid = jnp.concatenate([tile_valid, jnp.zeros((pad,) + tile_valid.shape[1:], bool)])
        origin = jnp.concatenate([origin, jnp.zeros((pad, 2), jnp.float32)])
    n_chunks = (T + pad) // B

    def body(args):
        o, i, v = args
        return _blend_tile_chunk(
            o, i, v, means2d, conics, opacities, features, depths, bg,
            tile_w, tile_h,
        )

    color, out_alpha, depth, final_t = jax.lax.map(
        body,
        (
            origin.reshape(n_chunks, B, 2),
            tile_idx.reshape(n_chunks, B, -1),
            tile_valid.reshape(n_chunks, B, -1),
        ),
    )
    # [n_chunks, B, P, C] -> [T, P, C] -> [th, tw, tile_h, tile_w, C] -> [H, W, C]
    def assemble(x, ch):
        x = x.reshape(T + pad, tile_h * tile_w, ch)[:T]
        x = x.reshape(th, tw, tile_h, tile_w, ch)
        x = x.transpose(0, 2, 1, 3, 4).reshape(th * tile_h, tw * tile_w, ch)
        return x[:height, :width]

    image = assemble(color, C)
    out_alpha = assemble(out_alpha[..., None], 1)[..., 0]
    depth = assemble(depth[..., None], 1)[..., 0]
    final_t = assemble(final_t[..., None], 1)[..., 0]
    return BlendOutput(image=image, alpha=out_alpha, depth=depth, final_t=final_t)
