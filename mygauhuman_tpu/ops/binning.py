"""Tile binning: build depth-sorted, fixed-capacity per-tile Gaussian lists.

TPU-first replacement for the reference's dynamic duplicate-with-keys + cub
radix sort pipeline (rasterizer_impl.cu:198-341, SURVEY.md §2.1): XLA demands
static shapes, so instead of a data-dependent `num_rendered` instance list we
use two static capacities:

  * S = max_tiles_per_gaussian — each Gaussian emits up to S (tile, depth)
    instances covering its screen rect (densify keeps splats small; rects are
    1-4 tiles in practice). Truncation is counted, never silent.
  * K = tile_capacity — each tile keeps its K nearest-in-depth instances.
    Because blending is front-to-back with a T < 1e-4 early stop, dropping
    the deepest tail is the principled truncation.

The (tile, depth) ordering is one lexicographic `jax.lax.sort` with
num_keys=2 — no 64-bit key packing needed (the CUDA trick of
`tileID<<32 | float_bits(depth)` is replaced by a 2-key sort, which is also
exact for negative depths). Per-tile ranges come from two searchsorteds.

Everything here is O(N·S log) sort + O(T·K) gather: static, fusable, and
shardable over a `gaussians` mesh axis (sort becomes a sharded sort or a
gather of per-shard lists — see parallel/).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileLists(NamedTuple):
    """Depth-sorted per-tile Gaussian index lists (static shapes).

    The fast path works in RANK space: instances carry the gaussian's depth
    rank r (not its id), and `order` maps rank -> id. Consumers that gather
    per-gaussian attributes should permute the attribute table by `order`
    once (a cheap [N]-row gather) and index it with `sorted_rank` — the
    id-space view `sorted_gid = order[sorted_rank]` lowers to a serialized
    1-D gather on TPU (~7 ns/element) and exists for the jnp spec path; XLA
    DCEs it when unused."""

    idx: jnp.ndarray        # [T, K] int32 Gaussian ids, front-to-back
    valid: jnp.ndarray      # [T, K] bool
    counts: jnp.ndarray     # [T] int32 instances per tile (pre-truncation, capped at N*S)
    overflow_tiles: jnp.ndarray   # int32: total instances dropped by K truncation
    overflow_gauss: jnp.ndarray   # int32: total instances dropped by S truncation
    overflow_inst: jnp.ndarray    # int32: instances dropped by I compaction
    sorted_gid: jnp.ndarray # [I] int32 tile-major depth-sorted instance ids
    sorted_tile: jnp.ndarray # [I] int32 tile id per sorted instance (T = dead)
    starts: jnp.ndarray     # [T] int32 offset of each tile's slice in sorted_gid
    sorted_rank: jnp.ndarray  # [I] int32 depth RANK per sorted instance
    order: jnp.ndarray      # [N] int32 rank -> gaussian id (identity on the
                            # lexicographic fallback path)
    rank: jnp.ndarray       # [N] int32 gaussian id -> depth rank (inverse)



def tile_dims(width: int, height: int, tile_w: int, tile_h: int) -> tuple[int, int]:
    return -(-width // tile_w), -(-height // tile_h)


def gaussian_tile_rects(
    means2d: jnp.ndarray,
    radii: jnp.ndarray,
    tw: int,
    th: int,
    tile_w: int,
    tile_h: int,
):
    """Per-Gaussian covered tile rect [min_x, min_y, max_x, max_y) (exclusive max).

    Parity: auxiliary.h getRect (floor((p-r)/B) .. floor((p+r+B-1)/B), clamped).
    """
    r = radii.astype(jnp.float32)
    x, y = means2d[..., 0], means2d[..., 1]
    min_x = jnp.clip(jnp.floor((x - r) / tile_w), 0, tw).astype(jnp.int32)
    min_y = jnp.clip(jnp.floor((y - r) / tile_h), 0, th).astype(jnp.int32)
    max_x = jnp.clip(jnp.floor((x + r + tile_w - 1) / tile_w), 0, tw).astype(jnp.int32)
    max_y = jnp.clip(jnp.floor((y + r + tile_h - 1) / tile_h), 0, th).astype(jnp.int32)
    return min_x, min_y, max_x, max_y


def _tile_counts_geometric(
    min_x: jnp.ndarray,      # [N] i32 rect min tile x
    min_y: jnp.ndarray,      # [N]
    rw: jnp.ndarray,         # [N] rect width in tiles
    touched: jnp.ndarray,    # [N] rw * rh
    live: jnp.ndarray,       # [N] bool
    S: int,
    tw: int,
    th: int,
) -> jnp.ndarray:
    """Exact per-tile instance counts [th*tw] i32, computed from the rect
    geometry instead of searchsorted over the sorted key array.

    The slot enumeration in bin_gaussians emits, per live Gaussian,
    m = min(touched, S) instances in row-major rect order: q = m // rw full
    rows plus a partial row of rem = m % rw. Each is a box on the tile grid;
    boxes become +-1 corner updates (2D inclusion-exclusion), accumulated
    with two small one-hot matmuls (MXU) and integrated by a 2D prefix sum.
    Cost is O(N) VPU + a [th+2, 8N] x [8N, tw+2] contraction — measured ~20x
    cheaper than the log2(N*S)-step searchsorted while-loops it replaces
    (540 us/frame at 512^2 / 8k capacity on v5e).
    """
    n = min_x.shape[0]
    rw_s = jnp.maximum(rw, 1)
    m = jnp.minimum(touched, S)
    q = m // rw_s
    rem = m % rw_s
    lv = live.astype(jnp.float32)

    y0, y1 = min_y, min_y + q
    y2 = y1 + 1
    x0, x1 = min_x, min_x + rw
    xr = min_x + rem
    # full-rows box [y0,y1) x [x0,x1), partial row [y1,y2) x [x0,xr);
    # degenerate boxes (q == 0 / rem == 0) cancel corner-wise on their own
    ys = jnp.stack([y0, y0, y1, y1, y1, y1, y2, y2], axis=1)   # [N, 8]
    xs = jnp.stack([x0, x1, x0, x1, x0, xr, x0, xr], axis=1)
    ws = jnp.array([1, -1, -1, 1, 1, -1, -1, 1], jnp.float32)[None, :] * lv[:, None]

    gy = jnp.arange(th + 2, dtype=jnp.int32)
    gx = jnp.arange(tw + 2, dtype=jnp.int32)
    oh_y = (ys.reshape(-1)[:, None] == gy[None, :]).astype(jnp.float32)
    oh_x = (xs.reshape(-1)[:, None] == gx[None, :]).astype(jnp.float32)
    grid = jax.lax.dot_general(
        oh_y * ws.reshape(-1)[:, None], oh_x,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                          # [th+2, tw+2]
    counts2d = jnp.cumsum(jnp.cumsum(grid, axis=0), axis=1)
    return jnp.round(counts2d[:th, :tw]).astype(jnp.int32).reshape(th * tw)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile_w", "tile_h",
        "max_tiles_per_gaussian", "tile_capacity", "instance_capacity",
    ),
)
def bin_gaussians(
    means2d: jnp.ndarray,
    radii: jnp.ndarray,
    depths: jnp.ndarray,
    visible: jnp.ndarray,
    *,
    width: int,
    height: int,
    tile_w: int = 16,
    tile_h: int = 16,
    max_tiles_per_gaussian: int = 16,
    tile_capacity: int = 1024,
    instance_capacity: int | None = None,
) -> TileLists:
    """Build depth-sorted per-tile lists. All shapes static.

    Args:
      means2d: [N, 2] pixel-space centers.
      radii:   [N] int32 screen radii (0 = culled).
      depths:  [N] camera-space z.
      visible: [N] bool.
      instance_capacity: I — static cap on the total (tile, gaussian)
        instance list. None keeps the exact N*S list; a finite I compacts
        the live instances BEFORE the sort (prefix-sum scatter), so sort /
        gather / blend work scales with the real instance count instead of
        the N*S worst case (at 64k capacity N*S is 1M slots while a real
        frame has ~100-200k instances). Dropped instances (beyond I) are
        counted in overflow_inst — counted, never silent.
    """
    N = means2d.shape[0]
    S = max_tiles_per_gaussian
    K = tile_capacity
    tw, th = tile_dims(width, height, tile_w, tile_h)
    T = tw * th

    min_x, min_y, max_x, max_y = gaussian_tile_rects(
        means2d, radii, tw, th, tile_w, tile_h
    )
    rw = max_x - min_x
    rh = max_y - min_y
    touched = rw * rh
    live = visible & (radii > 0) & (touched > 0)
    overflow_gauss = jnp.sum(
        jnp.where(live, jnp.maximum(touched - S, 0), 0)
    ).astype(jnp.int32)

    # Enumerate up to S covered tiles per Gaussian: slot s -> (dx, dy) in
    # rect. [S, N] orientation — lanes carry N (a multiple of 128, dense
    # tiling); the [N, S] form put S=16 in lanes, which T(8,128) pads to
    # 128 (8x physical size: six 40 us broadcasts at 64k capacity). The
    # flat instance ordering changes (slot-major), but the sort consumes
    # an unordered multiset — the sorted keys are bit-identical.
    s = jnp.arange(S, dtype=jnp.int32)[:, None]          # [S, 1]
    rw_safe = jnp.maximum(rw, 1)[None, :]                 # [1, N]
    dx = s % rw_safe
    dy = s // rw_safe
    slot_ok = live[None, :] & (s < jnp.minimum(touched, S)[None, :])
    tile_id = (min_y[None, :] + dy) * tw + (min_x[None, :] + dx)   # [S, N]
    tile_id = jnp.where(slot_ok, tile_id, T).astype(jnp.int32)     # sentinel T

    flat_tile = tile_id.reshape(-1)

    # Front-to-back order within each tile. Fast path: pack (tile, depth
    # RANK) into ONE int32 key — the global argsort rank preserves the exact
    # float ordering (the CUDA `tile<<32|float_bits` trick without 64-bit
    # keys, rasterizer_impl.cu:102-104), and a 1-key sort is ~2x cheaper on
    # TPU than the lexicographic (tile, f32) 2-key sort. Keys are unique
    # (each gaussian has a unique depth rank and appears at most once per
    # tile), so the sorts can be unstable.
    # Per-tile counts/starts come from the rect geometry (no searchsorted
    # over the sorted array — those lowered to log2(N*S)-step while-loops of
    # 1-D gathers, 540 us/frame at 512^2): counts are exact by construction
    # of the slot enumeration above, starts are their exclusive prefix sum.
    counts = _tile_counts_geometric(
        min_x, min_y, rw, touched, live, S, tw, th
    )
    bounds = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    starts = bounds[:T]
    ends = bounds[1:]
    total_live = bounds[T]

    rank_radix = 1
    while rank_radix < N:
        rank_radix *= 2
    overflow_inst = jnp.zeros((), jnp.int32)
    if (T + 1) * rank_radix < 2**31:
        # depth rank WITHOUT a scatter (scatters serialize on TPU — the
        # .at[order].set inverse-permutation fusion cost 304 us at 64k
        # capacity): sorting (order, iota) by order IS the inverse
        # permutation, and a second sort is ~3x cheaper than the scatter.
        order = jnp.argsort(depths.astype(jnp.float32))
        _, rank = jax.lax.sort(
            (order, jnp.arange(N, dtype=jnp.int32)),
            num_keys=1, is_stable=False,
        )
        flat_rank = jnp.broadcast_to(rank[None, :], (S, N)).reshape(-1)
        key = flat_tile * rank_radix + flat_rank
        # Sort the key ALONE (a single-operand sort moves half the data of
        # the (key, gid) pair sort: 904 -> 446 us at 64k capacity) — the
        # instance's rank is the key's low bits, and order[rank] recovers
        # the gaussian id when a consumer really needs id space.
        sorted_key = jax.lax.sort(key, is_stable=False)
        I = N * S
        if instance_capacity is not None and instance_capacity < N * S:
            # Dead slots carry sentinel keys (tile = T) and sort to the END,
            # so the live instances are exactly the sorted prefix — slice it
            # and downstream gather/blend work scales with I, not N*S. The
            # deepest global tail is what a too-small I drops (and counts).
            # Slice BEFORE deriving rank/tile so everything is I-sized.
            I = instance_capacity
            overflow_inst = jnp.maximum(total_live - I, 0)
            sorted_key = sorted_key[:I]
            starts = jnp.minimum(starts, I)
            ends = jnp.minimum(ends, I)
        sorted_tile = sorted_key // rank_radix
        sorted_rank = sorted_key % rank_radix
        sorted_gid = order.at[sorted_rank].get(mode="promise_in_bounds")
    else:
        I = N * S
        flat_gid = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[None, :], (S, N)
        ).reshape(-1)
        flat_depth = jnp.broadcast_to(
            depths[None, :], (S, N)
        ).reshape(-1).astype(jnp.float32)
        sorted_tile, _, sorted_gid = jax.lax.sort(
            (flat_tile, flat_depth, flat_gid), num_keys=2
        )
        sorted_tile = sorted_tile.astype(jnp.int32)
        sorted_rank = sorted_gid
        order = jnp.arange(N, dtype=jnp.int32)
        rank = order
    counts = ends - starts

    k = jnp.arange(K, dtype=jnp.int32)[None, :]                     # [1, K]
    pos = jnp.clip(starts[:, None] + k, 0, I - 1)
    idx = sorted_gid[pos]                                           # [T, K]
    valid = k < counts[:, None]
    overflow_tiles = jnp.sum(jnp.maximum(counts - K, 0)).astype(jnp.int32)

    return TileLists(
        idx=idx,
        valid=valid,
        counts=counts,
        overflow_tiles=overflow_tiles,
        overflow_gauss=overflow_gauss,
        overflow_inst=overflow_inst,
        sorted_gid=sorted_gid,
        sorted_tile=sorted_tile,
        starts=starts,
        sorted_rank=sorted_rank,
        order=order,
        rank=rank,
    )
