"""Pallas TPU blend kernel: per-tile front-to-back alpha compositing.

The jnp blend (ops/blend.py) evaluates a dense [tiles, K, pixels] tensor —
correct, differentiable, but O(T*K*P) regardless of how many instances each
tile really has. This kernel is the speed-of-light path: work is proportional
to the actual sorted instance list, exactly like the reference CUDA renderCUDA
(forward.cu:261-383), re-shaped for the TPU:

  * instance-major layout: binning's depth-sorted (tile, gaussian) list is
    pre-gathered into one [D, NS] matrix (rows = packed xy/conic/opacity/
    depth/features, NS instances in lanes). Each tile's instances are a
    CONTIGUOUS lane slice — per-tile work is chunked dynamic-slice DMAs, not
    scattered gathers.
  * per-tile grid; each step loops `cdiv(count_t, CHUNK)` chunks (dynamic
    trip count — empty tiles cost ~nothing).
  * alpha math on [P, CHUNK] blocks (P=256 sublanes x CHUNK lanes), the
    transmittance as a log-space cumsum along lanes, feature accumulation as
    one [P, CHUNK] @ [CHUNK, C] MXU matmul per chunk.
  * early termination parity: instances with T <= 1e-4 contribute zero
    (see ops/blend.py docstring for the equivalence argument).

Row layout (D = 8 + C, feature rows sublane-aligned at 8):
  0 x | 1 y | 2 cxx | 3 cxy | 4 cyy | 5 opacity | 6 depth | 7 ONES | 8.. feat
(the ones row rides the per-chunk MXU matmul so depth/weight sums come out of
the same contraction as the color accumulation)
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


LANE = 128
HDR = 8  # header rows before the feature rows


class InstanceData(NamedTuple):
    data: jnp.ndarray     # [8 + C, NS] f32 (see row layout above)
    starts: jnp.ndarray   # [T] i32 lane offset of each tile's slice
    counts: jnp.ndarray   # [T] i32 instances per tile


def attr_matrix(
    means2d: jnp.ndarray,       # [N, 2]
    conics: jnp.ndarray,        # [N, 3]
    opacities: jnp.ndarray,     # [N]
    depths: jnp.ndarray,        # [N]
    features: jnp.ndarray,      # [N, C]
) -> jnp.ndarray:
    """Component-major per-Gaussian attribute matrix [8 + ceil8(C), N]
    (row layout in the module docstring). Shared by the single-device
    instance gather and the tile-sharded exchange (parallel/raster.py)."""
    n = means2d.shape[0]
    c = features.shape[-1]
    c_pad = -(-c // 8) * 8 - c
    return jnp.concatenate(
        [
            means2d.T,
            conics.T,
            opacities[None, :],
            depths[None, :],
            jnp.ones((1, n), jnp.float32),   # ones row: yields w_sum in the
                                             # same MXU matmul as the features
            features.T,
            jnp.zeros((c_pad, n), jnp.float32),
        ],
        axis=0,
    )


def build_instance_data(
    sorted_idx: jnp.ndarray,    # [NS] depth-sorted instance ids (tile-major)
    starts: jnp.ndarray,        # [T]
    counts: jnp.ndarray,        # [T]
    means2d: jnp.ndarray,       # [N, 2]
    conics: jnp.ndarray,        # [N, 3]
    opacities: jnp.ndarray,     # [N]
    depths: jnp.ndarray,        # [N]
    features: jnp.ndarray,      # [N, C]
    chunk: int = LANE,
    order: jnp.ndarray | None = None,   # [N] rank -> gaussian id
) -> InstanceData:
    """Gather per-instance rows once; one XLA gather, fused upstream.

    With `order` given, `sorted_idx` is in RANK space (binning's fast path):
    the attribute table is permuted to rank order first — one [N]-row
    gather — so the instance gather needs no id recovery (order[rank] as a
    fused index is a serialized 1-D gather, 1.9 ms at 64k capacity)."""
    g = sorted_idx
    ns = g.shape[0]
    n = means2d.shape[0]
    c = features.shape[-1]
    c_pad = -(-c // 8) * 8 - c   # rows must tile to sublane multiples of 8
    # Row-major attribute matrix [D, N], then ONE lane-gather to instance
    # order. (Gathering [NS, D] rows and transposing costs ~2.4ms at 512^2;
    # the lane-gather form stays in a TPU-friendly layout throughout.)
    attrs = attr_matrix(means2d, conics, opacities, depths, features)
    if order is not None:
        attrs = attrs.at[:, order].get(mode="promise_in_bounds")
    # Pad the INDEX array (cheap, [pad] i32) instead of padding the gathered
    # [D, NS] matrix (a 400us pad of 128 MB at 64k capacity); padded entries
    # gather gaussian 0 — finite garbage the kernel's count mask never reads.
    # Indices are always < n, so promise_in_bounds skips the oob select.
    # Padding granularity covers BOTH kernels' chunk sizes: the backward
    # kernel slices 2*LANE windows of this same matrix, so a smaller
    # forward chunk must not shrink the tail padding (an out-of-range
    # pl.ds clamps the base and mis-aligns the tail chunk's lane mask).
    pad_chunk = max(chunk, 2 * LANE)
    pad = pad_chunk + ((-ns) % pad_chunk)
    g_pad = jnp.concatenate([g, jnp.zeros((pad,), g.dtype)])
    data = attrs.at[:, g_pad].get(mode="promise_in_bounds")
    return InstanceData(data=data, starts=starts, counts=counts)


def _lane_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along lanes (axis=1) — log-step shift-add
    (jnp.cumsum has no Pallas TPU lowering)."""
    chunk = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < chunk:
        shifted = pltpu.roll(x, shift=s, axis=1)
        x = x + jnp.where(lane >= s, shifted, 0.0)
        s *= 2
    return x


def _accumulate_tile(
    data_ref, chunk_buf, sem,
    start, count, px, py,
    *,
    n_feat: int,
    chunk: int,
    first=None,
):
    """Front-to-back blend of one tile's instance slice: returns
    (acc [2 + n_feat, P] = [d_sum; w_sum; features], final_t [P, 1]).
    Empty tiles (count == 0) cost one trip-count check and return the
    background state (zeros, final_t = 1).

    Double-buffered: chunk_buf is [2, D, chunk]; chunk ci+1's DMA is in
    flight while ci computes (the serial start/wait form left the VPU idle
    for the full DMA latency every chunk). `first=(first_buf, first_sem,
    ti)` means the CALLER already issued this tile's chunk-0 DMA into
    first_buf[ti] (cross-tile prefetch: at ~1 chunk per tile the
    start/wait latency of chunk 0 was the kernel's dominant serial cost —
    one full DMA latency per nonempty tile); chunk 0 is then consumed from
    there and the double buffer serves chunks >= 1.

    TWO transmittance carries (spec: ops/blend.py:9-18): log_t_all sums
    EVERY valid l1ma — the full cumprod whose t_after drives the include
    test (this is what makes include == the CUDA sticky-done decision;
    an include-gated carry would let the next chunk resurrect a saturated
    pixel: frozen T stays >= 1e-4, so a small-alpha instance would pass
    the test the spec fails) — while log_t_inc sums only INCLUDED l1ma
    and is the final_t output (CUDA freezes T at done)."""
    P = px.shape[0]
    base0 = (start // chunk) * chunk
    offset = start - base0
    n_chunks = pl.cdiv(offset + count, chunk)

    def dma(ci, slot):
        base = pl.multiple_of(base0 + ci * chunk, chunk)
        return pltpu.make_async_copy(
            data_ref.at[:, pl.ds(base, chunk)],
            chunk_buf.at[slot],
            sem.at[slot],
        )

    def math(rd, ci, carry):
        """One chunk of blend math; rd(lo, hi) reads rows [lo, hi) of the
        chunk's [D, chunk] buffer."""
        acc, t_all, t_inc = carry
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        glane = ci * chunk + lane
        in_range = (
            (glane >= offset) & (glane < offset + count)
        ).astype(jnp.float32)

        xy_x = rd(0, 1)
        xy_y = rd(1, 2)
        cxx = rd(2, 3)
        cxy = rd(3, 4)
        cyy = rd(4, 5)
        op = rd(5, 6)

        dx = xy_x - px
        dy = xy_y - py
        power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
        alpha = jnp.minimum(0.99, op * jnp.exp(power))
        ok = (power <= 0.0) & (alpha >= 1.0 / 255.0)
        a = jnp.where(ok, alpha, 0.0) * in_range

        l1ma = jnp.log1p(-a)
        cum = _lane_cumsum(l1ma) + t_all          # t_all: log-space carry
        t_after = jnp.exp(cum)
        # t_before = exp(cum - l1ma) == t_after / (1 - a): one divide
        # instead of a second transcendental pass over [P, chunk]
        t_before = t_after / (1.0 - a)            # a <= 0.99, never /0
        include = (a > 0.0) & (t_after >= 1e-4)
        w = jnp.where(include, a * t_before, 0.0)

        # rows [depth, ONES, feat...] x w -> [2 + nf, P]: depth sum,
        # weight sum and color accumulation in ONE MXU contraction
        acc = acc + jax.lax.dot_general(
            rd(HDR - 2, None), w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t_all = t_all + jnp.sum(l1ma, axis=1, keepdims=True)
        t_inc = t_inc + jnp.sum(
            jnp.where(include, l1ma, 0.0), axis=1, keepdims=True
        )
        return acc, t_all, t_inc

    # ---- chunk 0: from the caller's prefetch buffer, or a local DMA
    @pl.when(n_chunks > 1)
    def _():
        dma(1, 1).start()          # overlap chunk 1 with chunk 0's math

    if first is None:
        dma(0, 0).start()
        dma(0, 0).wait()

        def rd0(lo, hi):
            return chunk_buf[0, lo:hi, :]
    else:
        first_buf, first_sem, ti = first
        pltpu.make_async_copy(
            data_ref.at[:, pl.ds(pl.multiple_of(base0, chunk), chunk)],
            first_buf.at[ti],
            first_sem.at[ti],
        ).wait()

        def rd0(lo, hi):
            return first_buf[ti, lo:hi, :]

    acc0 = jnp.zeros((2 + n_feat, P), jnp.float32)
    zero1 = jnp.zeros((P, 1), jnp.float32)
    carry = math(rd0, 0, (acc0, zero1, zero1))

    # ---- chunks >= 1: double-buffered while loop.
    # Early termination (exact): the full-cumprod t_after is monotone
    # decreasing, so once every pixel's log_t_all < log(1e-4) all later
    # instances fail the include test — skipping their chunks changes
    # nothing (parity: forward.cu:341-356's per-pixel done flag / block
    # contributor stop). Dense tiles saturate within their first chunk.
    def body(ci, carry):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            dma(ci + 1, 1 - slot).start()

        dma(ci, slot).wait()
        return math(lambda lo, hi: chunk_buf[slot, lo:hi, :], ci, carry)

    log_eps = jnp.float32(-9.210340371976182)   # log(1e-4)

    def cond(state):
        ci, _, t_all, _ = state
        return (ci < n_chunks) & (jnp.max(t_all) >= log_eps)

    def wbody(state):
        ci, acc, t_all, t_inc = state
        acc, t_all, t_inc = body(ci, (acc, t_all, t_inc))
        return ci + 1, acc, t_all, t_inc

    ci, acc, _, t_inc = jax.lax.while_loop(
        cond, wbody, (jnp.ones((), jnp.int32),) + carry
    )

    # drain the in-flight prefetch if the loop exited early (body ci-1
    # started DMA ci; every started DMA must be waited before the slot and
    # semaphore are reused by the next tile)
    @pl.when(ci < n_chunks)
    def _():
        dma(ci, jax.lax.rem(ci, 2)).wait()

    return acc, jnp.exp(t_inc)


def _blend_kernel(
    starts_ref, counts_ref, tile_base_ref,   # scalar prefetch
    data_ref,                     # [D, NS] in ANY/HBM
    prefill_ref,                  # [T, P, C_OUT] background, aliased to out
    out_ref,                      # [T, P, C_OUT] in ANY/HBM (DMA writes)
    chunk_buf, stage_buf, sem, sem2,   # scratch
    *,
    tile_w: int,
    tile_h: int,
    tiles_x: int,
    n_feat: int,
    n_real: int,
    chunk: int,
    tiles_per_step: int,
):
    """Blend `tiles_per_step` consecutive tiles per grid step (amortizes the
    per-grid-step Mosaic overhead, which dominates for sparse tiles).

    tile_base_ref[0] offsets local tile ids into the GLOBAL tile grid for
    pixel-coordinate math — a shard_map shard blends tiles
    [tile_base, tile_base + T_local) of the full image (parallel/raster.py);
    single-device callers pass 0."""
    P = tile_w * tile_h
    # In-tile pixel pattern is tile-invariant: compute the int mod/div chain
    # ONCE per grid step (integer div expands to long VPU sequences).
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    pix_x = (pix % tile_w).astype(jnp.float32)
    pix_y = (pix // tile_w).astype(jnp.float32)

    def one_tile(ti):
        # program_id must be read OUTSIDE pl.when branches (inside a cond it
        # gets hoisted as an unsupported jaxpr constant)
        t = pl.program_id(0) * tiles_per_step + ti
        start = starts_ref[t]
        count = counts_ref[t]

        # empty tiles cost nothing: the aliased prefill input already holds
        # the background state for every tile
        @pl.when(count > 0)
        def _():
            _blend_nonempty(ti, t, start, count)

    def _blend_nonempty(ti, t, start, count):
        tg = tile_base_ref[0] + t
        x0 = ((tg % tiles_x) * tile_w).astype(jnp.float32)
        y0 = ((tg // tiles_x) * tile_h).astype(jnp.float32)
        px = x0 + pix_x
        py = y0 + pix_y

        acc, final_t = _accumulate_tile(
            data_ref, chunk_buf, sem, start, count, px, py,
            n_feat=n_feat, chunk=chunk,
        )
        # stage only the REAL channels (the ceil8 feature-pad columns of the
        # instance matrix never leave the kernel): rows [c_real, w, d, T]
        # padded to a sublane multiple — 24 staged rows instead of 32 for
        # C=19, which is 25% less assemble traffic downstream.
        stage_buf[:n_real, :] = acc[2:2 + n_real, :]        # color rows
        stage_buf[n_real:n_real + 1, :] = acc[1:2, :]       # w_sum (ones row)
        stage_buf[n_real + 1:n_real + 2, :] = acc[0:1, :]   # d_sum
        stage_buf[n_real + 2:n_real + 3, :] = jnp.transpose(final_t)
        if stage_buf.shape[0] > n_real + 3:   # zero the sublane-pad rows
            stage_buf[n_real + 3:, :] = jnp.zeros(
                (stage_buf.shape[0] - n_real - 3, P), jnp.float32
            )
        wr = pltpu.make_async_copy(stage_buf, out_ref.at[t], sem2)
        wr.start()
        wr.wait()

    # static unroll: keeps the out_ref writes statically indexed
    for ti in range(tiles_per_step):
        one_tile(ti)


def _blend_row_kernel(
    starts_ref, counts_ref, tile_base_ref,   # scalar prefetch
    data_ref,                     # [D, NS] in ANY/HBM
    out_ref,                      # [c_stage, Hp, Wp] PLANAR in ANY/HBM
    chunk_buf, stage_row, first_buf, sem, sem2, sem_first,   # scratch
    *,
    tile_w: int,
    tile_h: int,
    tiles_x: int,
    n_feat: int,
    n_real: int,
    chunk: int,
    tiles_per_step: int,
):
    """Row-staged blend: each grid step blends `tiles_per_step` consecutive
    tiles of ONE tile row, assembles them in VMEM as a planar
    [c_stage, tile_h, TB*tile_w] strip (in-register lane-slice moves), and
    writes the strip with a single aligned DMA into a planar [c_stage, H, W]
    output. This removes the [T, c, P] -> [H, W, C] XLA relayout entirely
    (two copies, ~456 us/frame at 512^2) — the planar output IS the
    {1,0,2}-layout image XLA was materializing anyway.

    Alignment contract (checked by the caller): tiles_per_step divides
    tiles_x and tiles_per_step * tile_w is a multiple of 128."""
    P = tile_w * tile_h
    TBW = tiles_per_step * tile_w
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    pix_x = (pix % tile_w).astype(jnp.float32)
    pix_y = (pix // tile_w).astype(jnp.float32)

    # Double-buffered strip staging: each grid step stages into slot
    # s%2 and STARTS its write without waiting — the wait for the write
    # issued at step s-2 (same slot) happens here, before the slot is
    # reused. The serial start->wait form stalled every strip on the
    # full write-DMA latency (~128 strips/frame at 512^2).
    s_id = pl.program_id(0)
    ns = pl.num_programs(0)
    s2 = jax.lax.rem(s_id, 2)

    def strip_write(slot, step):
        row = (step * tiles_per_step) // tiles_x
        col0 = (step * tiles_per_step) % tiles_x
        y_off = pl.multiple_of(row * tile_h, tile_h)
        x_off = pl.multiple_of(col0 * tile_w, TBW)
        return pltpu.make_async_copy(
            stage_row.at[slot],
            out_ref.at[:, pl.ds(y_off, tile_h), pl.ds(x_off, TBW)],
            sem2.at[slot],
        )

    @pl.when(s_id >= 2)
    def _():
        strip_write(s2, s_id - 2).wait()

    # background prefill for the whole strip: zeros, final_t row = 1
    rows3 = jax.lax.broadcasted_iota(
        jnp.int32, (stage_row.shape[1], tile_h, TBW), 0
    )
    stage_row[s2] = jnp.where(rows3 == n_real + 2, 1.0, 0.0)

    # cross-tile prefetch: issue EVERY nonempty tile's chunk-0 DMA up
    # front, so only the strip's first tile ever stalls on DMA latency
    # (at ~1 chunk per tile that latency was the dominant serial cost:
    # one start->wait round trip per nonempty tile)
    for ti in range(tiles_per_step):
        t = pl.program_id(0) * tiles_per_step + ti
        start = starts_ref[t]
        count = counts_ref[t]

        @pl.when(count > 0)
        def _():
            base = pl.multiple_of((start // chunk) * chunk, chunk)
            pltpu.make_async_copy(
                data_ref.at[:, pl.ds(base, chunk)],
                first_buf.at[ti],
                sem_first.at[ti],
            ).start()

    def one_tile(ti):
        t = pl.program_id(0) * tiles_per_step + ti
        start = starts_ref[t]
        count = counts_ref[t]

        @pl.when(count > 0)
        def _():
            tg = tile_base_ref[0] + t
            x0 = ((tg % tiles_x) * tile_w).astype(jnp.float32)
            y0 = ((tg // tiles_x) * tile_h).astype(jnp.float32)
            acc, final_t = _accumulate_tile(
                data_ref, chunk_buf, sem, start, count,
                x0 + pix_x, y0 + pix_y,
                n_feat=n_feat, chunk=chunk,
                first=(first_buf, sem_first, ti),
            )
            # rows [n_real color, w_sum, d_sum, final_t]
            val = jnp.concatenate(
                [acc[2:2 + n_real, :], acc[1:2, :], acc[0:1, :],
                 jnp.transpose(final_t)],
                axis=0,
            )                                       # [n_real + 3, P]
            # scatter the tile's columns into the row strip: static
            # lane-slice moves (VREG shuffles), no HBM traffic
            for y in range(tile_h):
                stage_row[s2, :n_real + 3, y,
                          ti * tile_w:(ti + 1) * tile_w] = (
                    val[:, y * tile_w:(y + 1) * tile_w]
                )

    for ti in range(tiles_per_step):
        one_tile(ti)

    # one aligned DMA per strip (alignment: col0 is a multiple of TB, so
    # col0*tile_w is a multiple of TBW >= 128 by the row_mode_supported
    # contract); started here, waited two steps later / at kernel end
    strip_write(s2, s_id).start()

    # final step: drain every write still in flight (own + the step-(ns-2)
    # write on the other slot, which no later step will wait for)
    @pl.when(s_id == ns - 1)
    def _():
        @pl.when(ns >= 2)
        def _():
            strip_write(1 - s2, ns - 2).wait()

        strip_write(s2, s_id).wait()


def row_mode_supported(
    n_tiles: int, tiles_x: int, tile_w: int, tile_h: int
) -> int:
    """Return the row-kernel tiles_per_step (0 if unsupported): the SMALLEST
    TB dividing tiles_x with TB * tile_w % 128 == 0 (DMA lane alignment),
    with n_tiles covering whole rows. Smallest wins: the kernel statically
    unrolls TB tiles x tile_h staging stores per grid step, and Mosaic
    compile time/size grows superlinearly with the unroll (TB = 32 produced
    a 20 MB MLIR module that the compiler rejected)."""
    if n_tiles % tiles_x:
        return 0
    for tb in (1, 2, 4, 8, 16, 32, 64, 128):
        if tiles_x % tb == 0 and (tb * tile_w) % 128 == 0:
            return tb
    if (tiles_x * tile_w) % 128 == 0:
        return tiles_x
    return 0


@functools.partial(
    jax.jit,
    static_argnames=("n_tiles", "tiles_x", "n_channels", "tile_w", "tile_h",
                     "chunk", "interpret"),
)
def blend_rows_raw(
    data: jnp.ndarray,       # [D, NS_pad] instance matrix (lane-padded)
    starts: jnp.ndarray,     # [n_tiles]
    counts: jnp.ndarray,     # [n_tiles]
    tile_base: jnp.ndarray,  # [1] i32 — global index of local tile 0
    *,
    n_tiles: int,
    tiles_x: int,
    n_channels: int,
    tile_w: int = 16,
    tile_h: int = 16,
    chunk: int = LANE,
    interpret: bool = False,
) -> jnp.ndarray:
    """Row-staged planar blend -> [c_stage, (n_tiles/tiles_x)*tile_h,
    tiles_x*tile_w] with planes [n_channels colors, w_sum, d_sum, final_t,
    zero pad]. Caller must have row_mode_supported(...) > 0."""
    T = n_tiles
    D = data.shape[0]
    n_feat = D - HDR
    c_stage = -(-(n_channels + 3) // 8) * 8
    TB = row_mode_supported(n_tiles, tiles_x, tile_w, tile_h)
    assert TB > 0, (n_tiles, tiles_x, tile_w)
    n_rows = n_tiles // tiles_x

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T // TB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, D, chunk), jnp.float32),   # double-buffered reads
            # double-buffered strip staging (write DMA overlaps next strip)
            pltpu.VMEM((2, c_stage, tile_h, TB * tile_w), jnp.float32),
            pltpu.VMEM((TB, D, chunk), jnp.float32),  # chunk-0 prefetches
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((TB,)),
        ],
    )
    kernel = functools.partial(
        _blend_row_kernel, tile_w=tile_w, tile_h=tile_h, tiles_x=tiles_x,
        n_feat=n_feat, n_real=n_channels, chunk=chunk, tiles_per_step=TB,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (c_stage, n_rows * tile_h, tiles_x * tile_w), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            has_side_effects=True,
        ),
    )(starts, counts, tile_base.astype(jnp.int32), data)


def finish_planar(
    planar: jnp.ndarray,         # [c_stage, Hp, Wp] row-kernel output
    bg: jnp.ndarray,             # [n_channels]
    *,
    n_channels: int,
    width: int,
    height: int,
):
    """Background-compose + crop the planar row-kernel output. The [H, W, C]
    image view is a transpose of contiguous planes — XLA assigns it the
    {1,0,2} layout it already prefers, so no relayout copy."""
    planar = planar[:, :height, :width]
    final_t = planar[n_channels + 2]
    color = planar[:n_channels] + final_t[None] * bg[:, None, None]
    image = jnp.transpose(color, (1, 2, 0))
    alpha = planar[n_channels]
    depth = planar[n_channels + 1]
    return image, alpha, depth, final_t


@functools.partial(
    jax.jit,
    static_argnames=("n_tiles", "tiles_x", "n_channels", "tile_w", "tile_h",
                     "chunk", "interpret"),
)
def blend_tiles_raw(
    data: jnp.ndarray,       # [D, NS_pad] instance matrix (lane-padded)
    starts: jnp.ndarray,     # [n_tiles] local-tile slice offsets
    counts: jnp.ndarray,     # [n_tiles]
    tile_base: jnp.ndarray,  # [1] i32 — global index of local tile 0
    *,
    n_tiles: int,
    tiles_x: int,
    n_channels: int,
    tile_w: int = 16,
    tile_h: int = 16,
    chunk: int = LANE,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the blend kernel over `n_tiles` consecutive tiles of a global
    `tiles_x`-wide grid; returns raw tile-major output [n_tiles, c_stage, P]
    with rows [n_channels real feature rows, w_sum, d_sum, final_t,
    zero pad to a sublane multiple]. This is the shard-level entry used by
    the tile-sharded rasterizer (parallel/raster.py); the single-device
    blend_pallas_raw wraps it with tile_base = 0."""
    T = n_tiles
    P = tile_w * tile_h
    D = data.shape[0]
    n_feat = D - HDR             # padded feature count (multiple of 8)
    c_out = n_channels + 3
    c_stage = -(-c_out // 8) * 8  # staged rows (sublane multiple of 8)

    TB = 32                       # ranked-tile batching per grid step
    while T % TB:
        TB -= 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T // TB,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # data stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),        # prefill (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # DMA-written per tile
        scratch_shapes=[
            pltpu.VMEM((2, D, chunk), jnp.float32),   # double-buffered
            pltpu.VMEM((c_stage, P), jnp.float32),    # lane-major staging
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _blend_kernel, tile_w=tile_w, tile_h=tile_h, tiles_x=tiles_x,
        n_feat=n_feat, n_real=n_channels, chunk=chunk, tiles_per_step=TB,
    )
    # background prefill: zero color/alpha/depth, final_t = 1; the kernel
    # only overwrites non-empty tiles (input_output alias; indices count
    # the scalar-prefetch args)
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, c_stage, P), 1)
    prefill = jnp.where(rows == n_channels + 2, 1.0, 0.0)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, c_stage, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            has_side_effects=True,
        ),
    )(starts, counts, tile_base.astype(jnp.int32), data, prefill)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_w", "tile_h", "chunk",
                     "n_channels", "interpret"),
)
def blend_pallas_raw(
    inst: InstanceData,
    bg: jnp.ndarray,
    *,
    width: int,
    height: int,
    n_channels: int,
    tile_w: int = 16,
    tile_h: int = 16,
    chunk: int = LANE,
    interpret: bool = False,
):
    """Run the kernel; returns (image [H,W,n_channels], alpha, depth,
    final_t). The instance matrix carries ceil8-padded feature rows; the
    pad columns come back as zeros and are sliced off here."""
    tw = -(-width // tile_w)
    th = -(-height // tile_h)
    T = tw * th

    if row_mode_supported(T, tw, tile_w, tile_h):
        planar = blend_rows_raw(
            inst.data, inst.starts, inst.counts, jnp.zeros((1,), jnp.int32),
            n_tiles=T, tiles_x=tw, n_channels=n_channels,
            tile_w=tile_w, tile_h=tile_h, chunk=chunk,
            interpret=interpret,
        )
        return finish_planar(
            planar, bg, n_channels=n_channels, width=width, height=height,
        )

    tiles_out = blend_tiles_raw(
        inst.data, inst.starts, inst.counts, jnp.zeros((1,), jnp.int32),
        n_tiles=T, tiles_x=tw, n_channels=n_channels,
        tile_w=tile_w, tile_h=tile_h, chunk=chunk,
        interpret=interpret,
    )

    return finish_tiles(
        tiles_out, bg, n_channels=n_channels,
        width=width, height=height, tile_w=tile_w, tile_h=tile_h,
    )


def finish_tiles(
    tiles_out: jnp.ndarray,      # [T, c_stage, P] raw kernel output
    bg: jnp.ndarray,             # [n_channels]
    *,
    n_channels: int,
    width: int,
    height: int,
    tile_w: int,
    tile_h: int,
):
    """Background-compose + tile-major -> [H, W, ...] assembly. Shared by
    the single-device path and the tile-sharded rasterizer (which
    concatenates per-strip kernel outputs into the same global [T, ...])."""
    tw = -(-width // tile_w)
    th = -(-height // tile_h)
    color = tiles_out[:, :n_channels, :]                 # [T, C, P]
    w_sum = tiles_out[:, n_channels, :]
    d_sum = tiles_out[:, n_channels + 1, :]
    final_t = tiles_out[:, n_channels + 2, :]
    color = color + final_t[:, None, :] * bg[None, :, None]

    def assemble(x, ch):
        # [T, ch, P] -> [H, W, ch]
        x = x.reshape(th, tw, ch, tile_h, tile_w)
        x = x.transpose(0, 3, 1, 4, 2).reshape(th * tile_h, tw * tile_w, ch)
        return x[:height, :width]

    image = assemble(color, n_channels)
    alpha = assemble(w_sum[:, None, :], 1)[..., 0]
    depth = assemble(d_sum[:, None, :], 1)[..., 0]
    final_t2 = assemble(final_t[:, None, :], 1)[..., 0]
    return image, alpha, depth, final_t2


# ----------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward, Pallas-kernel (or jnp) backward
# ----------------------------------------------------------------------------

from mygauhuman_tpu.ops.blend import BlendOutput, blend as _jnp_blend  # noqa: E402


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15, 16, 17, 18)
)
def blend_pallas(
    sorted_rank, order, rank, starts, counts,
    means2d, conics, opacities, features, depths, bg,
    width, height, tile_w, tile_h, chunk_tiles, tile_capacity, interpret,
    kernel_bwd,
) -> BlendOutput:
    """Pallas forward; backward via the Pallas backward kernel
    (ops/pallas_blend_bwd.py) or, with kernel_bwd=False, the jnp blend's
    autodiff (identical math either way — the parity tests assert it).
    `counts` must already be capped at tile_capacity K by the caller. The
    jnp path's [T, K] id lists are NOT taken as inputs (custom_vjp calls are
    opaque to DCE — passing them would keep an 8ms dead gather alive in
    forward-only renders); both backwards rebuild what they need from
    (sorted_rank, order, rank, starts, counts) — binning's rank-space
    triplet (TileLists.sorted_rank/order/rank).
    """
    inst = build_instance_data(
        sorted_rank, starts, counts, means2d, conics, opacities, depths,
        features, order=order,
    )
    image, alpha, depth, final_t = blend_pallas_raw(
        inst, bg, width=width, height=height,
        n_channels=features.shape[-1], tile_w=tile_w, tile_h=tile_h,
        interpret=interpret,
    )
    return BlendOutput(image=image, alpha=alpha, depth=depth, final_t=final_t)


def _blend_pallas_fwd(
    sorted_rank, order, rank, starts, counts,
    means2d, conics, opacities, features, depths, bg,
    width, height, tile_w, tile_h, chunk_tiles, tile_capacity, interpret,
    kernel_bwd,
):
    out = blend_pallas(
        sorted_rank, order, rank, starts, counts,
        means2d, conics, opacities, features, depths, bg,
        width, height, tile_w, tile_h, chunk_tiles, tile_capacity, interpret,
        kernel_bwd,
    )
    res = (sorted_rank, order, rank, starts, counts, means2d, conics,
           opacities, features, depths, bg, out.final_t)
    return out, res


def _tile_major(x, th, tw, tile_h, tile_w):
    """[H, W, C] -> [T, P, C] (inverse of blend_pallas_raw's assemble)."""
    H, W = x.shape[:2]
    pad_h = th * tile_h - H
    pad_w = tw * tile_w - W
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, pad_h), (0, pad_w), (0, 0)))
    x = x.reshape(th, tile_h, tw, tile_w, x.shape[-1])
    return x.transpose(0, 2, 1, 3, 4).reshape(th * tw, tile_h * tile_w, -1)


def _blend_pallas_bwd(
    width, height, tile_w, tile_h, chunk_tiles, tile_capacity, interpret,
    kernel_bwd, res, g,
):
    (sorted_rank, order, rank, starts, counts, means2d, conics, opacities,
     features, depths, bg, final_t) = res
    n = means2d.shape[0]
    c = features.shape[-1]

    # bg coupling: color = raw + final_t * bg
    dbg = jnp.einsum("hw,hwc->c", final_t, g.image)
    g_final_t_eff = g.final_t + jnp.einsum("hwc,c->hw", g.image, bg)

    if kernel_bwd:
        from mygauhuman_tpu.ops.pallas_blend_bwd import blend_pallas_bwd_raw

        tw = -(-width // tile_w)
        th = -(-height // tile_h)
        c_pad = -(-c // 8) * 8
        cot = jnp.concatenate(
            [
                g.image,
                jnp.zeros(g.image.shape[:2] + (c_pad - c,), jnp.float32),
                g.alpha[..., None],
                g.depth[..., None],
                g_final_t_eff[..., None],
            ],
            axis=-1,
        )
        cot_tiles = _tile_major(cot, th, tw, tile_h, tile_w)

        inst = build_instance_data(
            sorted_rank, starts, counts, means2d, conics, opacities, depths,
            features, order=order,
        )
        grads = blend_pallas_bwd_raw(
            inst.data, starts, counts, cot_tiles,
            width=width, height=height, tile_w=tile_w, tile_h=tile_h,
            interpret=interpret,
        )                                           # [NS_pad, ceil128(G)]
        grads = grads[:, :inst.data.shape[0]]       # drop the lane pad
        ns = sorted_rank.shape[0]
        # Deterministic per-gaussian reduction (no atomics). Fast path:
        # invert the binning sort's permutation with ONE unstable
        # (slot, position) sort, lane-gather each slot's gradient column,
        # and finish with a [N, S] reshape-sum. Slots that were compacted
        # away (position >= I) are masked; dead or K-truncated slots gather
        # zero-initialized lanes. (A searchsorted/segment_sum formulation
        # lowers to 1-D gathers / scatter-adds that cost 7-160 ms at 64k
        # capacity; everything here stays in fast sort + lane-gather form.)
        # Deterministic per-gaussian reduction (no atomics): scatter-add
        # keyed by gaussian id over the ns live instances. Measured
        # alternatives at 64k capacity (all slower): inverting the binning
        # sort + [N*S, G] row-gather + MXU block-sum — the 1M-row gather is
        # random 128-byte HBM reads at 10-16 ms regardless of layout;
        # searchsorted — lowers to a 20-step while loop of 1-D gathers
        # (160 ms). The scatter-add scales with ns, so a right-sized
        # instance_capacity is the real lever.
        per_rank = jax.ops.segment_sum(
            grads[:ns], sorted_rank, num_segments=n
        )
        # back to id space: gaussian g's gradient lives at row rank[g] — a
        # [N]-row gather, not a scatter
        per_g = per_rank.at[rank].get(mode="promise_in_bounds")
        dm2 = per_g[:, 0:2]
        dcon = per_g[:, 2:5]
        dop = per_g[:, 5]
        ddep = per_g[:, 6]
        dfeat = per_g[:, HDR:HDR + c]
        return (None, None, None, None, None, dm2, dcon, dop, dfeat, ddep,
                dbg)

    # jnp-autodiff fallback: rebuild the [T, K] lists and replay
    K = tile_capacity
    ns = sorted_rank.shape[0]
    sorted_gid = order.at[sorted_rank].get(mode="promise_in_bounds")
    k = jnp.arange(K, dtype=jnp.int32)[None, :]
    pos = jnp.clip(starts[:, None] + k, 0, ns - 1)
    idx = sorted_gid[pos]
    valid = k < counts[:, None]

    def ref_blend(m2, con, op, feat, dep, bgc):
        return _jnp_blend(
            idx, valid, m2, con, op, feat, dep, bgc,
            width=width, height=height, tile_w=tile_w, tile_h=tile_h,
            chunk_tiles=chunk_tiles,
        )

    _, vjp = jax.vjp(ref_blend, means2d, conics, opacities, features,
                     depths, bg)
    dm2, dcon, dop, dfeat, ddep, dbg2 = vjp(BlendOutput(*g))
    return (None, None, None, None, None, dm2, dcon, dop, dfeat, ddep, dbg2)


blend_pallas.defvjp(_blend_pallas_fwd, _blend_pallas_bwd)


# ----------------------------------------------------------------------------
# Instance-level differentiable blend (the shard_map / tile-strip entry).
#
# blend_pallas differentiates w.r.t. PER-GAUSSIAN arrays and rebuilds the
# instance gather internally — that requires every shard to hold the full
# Gaussian set. Under the tile-sharded rasterizer (parallel/raster.py) a
# shard only holds EXCHANGED instance data for its strip, so the custom_vjp
# must sit at the instance-data level: gradients flow back through the
# all_to_all exchange to the owning shard via plain XLA AD.
# ----------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def blend_instances(
    data, starts, counts, tile_base,
    n_tiles, tiles_x, n_channels, tile_w, tile_h, interpret,
):
    """Differentiable raw tile blend: [D, NS_pad] instance matrix ->
    [n_tiles, c_stage, P] (rows: n_channels features, w_sum, d_sum,
    final_t, zero pad)."""
    return blend_tiles_raw(
        data, starts, counts, tile_base,
        n_tiles=n_tiles, tiles_x=tiles_x, n_channels=n_channels,
        tile_w=tile_w, tile_h=tile_h,
        interpret=interpret,
    )


def _blend_instances_fwd(
    data, starts, counts, tile_base,
    n_tiles, tiles_x, n_channels, tile_w, tile_h, interpret,
):
    out = blend_instances(
        data, starts, counts, tile_base,
        n_tiles, tiles_x, n_channels, tile_w, tile_h, interpret,
    )
    return out, (data, starts, counts, tile_base)


def _blend_instances_bwd(
    n_tiles, tiles_x, n_channels, tile_w, tile_h, interpret, res, g,
):
    from mygauhuman_tpu.ops.pallas_blend_bwd import blend_tiles_bwd_raw

    data, starts, counts, tile_base = res
    D = data.shape[0]
    n_feat = D - HDR
    P = tile_w * tile_h
    # bwd-kernel cotangent layout: [T, P, n_feat + 3] — real feature-channel
    # cotangents, zeros for the instance matrix's ceil8 pad columns, then
    # the w_sum / d_sum / final_t rows (stage-pad rows carry no cotangent)
    gc = jnp.transpose(g[:, :n_channels, :], (0, 2, 1))
    aux = jnp.transpose(g[:, n_channels:n_channels + 3, :], (0, 2, 1))
    cot = jnp.concatenate(
        [gc, jnp.zeros((g.shape[0], P, n_feat - n_channels), jnp.float32),
         aux],
        axis=-1,
    )
    d_data = blend_tiles_bwd_raw(
        data, starts, counts, tile_base, cot,
        n_tiles=n_tiles, tiles_x=tiles_x, tile_w=tile_w, tile_h=tile_h,
        interpret=interpret,
    )[:, :D].T     # kernel emits [NS, ceil128(G)]; exchange wants [G, NS]
    return (d_data, None, None, None)


blend_instances.defvjp(_blend_instances_fwd, _blend_instances_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def blend_instances_planar(
    data, starts, counts, tile_base,
    n_tiles, tiles_x, n_channels, tile_w, tile_h, interpret,
):
    """Differentiable raw blend with a PLANAR output
    [c_stage, (n_tiles/tiles_x)*tile_h, tiles_x*tile_w] via the row-staged
    kernel — the fast path for shard strips covering whole tile rows
    (`row_mode_supported(n_tiles, tiles_x, ...) > 0` required): the
    tile-major kernel + XLA [T, c, P] -> [H, W, C] relayout costs ~3x the
    row kernel at 512^2 (PERF.md round-4 sharded numbers). Planar strips
    concatenate along H across shards and finish with `finish_planar`."""
    return blend_rows_raw(
        data, starts, counts, tile_base,
        n_tiles=n_tiles, tiles_x=tiles_x, n_channels=n_channels,
        tile_w=tile_w, tile_h=tile_h,
        interpret=interpret,
    )


def _blend_instances_planar_fwd(
    data, starts, counts, tile_base,
    n_tiles, tiles_x, n_channels, tile_w, tile_h, interpret,
):
    out = blend_instances_planar(
        data, starts, counts, tile_base,
        n_tiles, tiles_x, n_channels, tile_w, tile_h, interpret,
    )
    return out, (data, starts, counts, tile_base)


def _blend_instances_planar_bwd(
    n_tiles, tiles_x, n_channels, tile_w, tile_h, interpret, res, g,
):
    from mygauhuman_tpu.ops.pallas_blend_bwd import blend_tiles_bwd_raw

    data, starts, counts, tile_base = res
    D = data.shape[0]
    n_feat = D - HDR
    P = tile_w * tile_h
    n_rows = n_tiles // tiles_x
    c_stage = g.shape[0]
    # planar cotangent [c_stage, Hs, Ws] -> tile-major [T, P, c_stage]
    gt = g.reshape(c_stage, n_rows, tile_h, tiles_x, tile_w)
    gt = jnp.transpose(gt, (1, 3, 2, 4, 0)).reshape(n_tiles, P, c_stage)
    gc = gt[..., :n_channels]
    aux = gt[..., n_channels:n_channels + 3]
    cot = jnp.concatenate(
        [gc, jnp.zeros((n_tiles, P, n_feat - n_channels), jnp.float32),
         aux],
        axis=-1,
    )
    d_data = blend_tiles_bwd_raw(
        data, starts, counts, tile_base, cot,
        n_tiles=n_tiles, tiles_x=tiles_x, tile_w=tile_w, tile_h=tile_h,
        interpret=interpret,
    )[:, :D].T
    return (d_data, None, None, None)


blend_instances_planar.defvjp(
    _blend_instances_planar_fwd, _blend_instances_planar_bwd)
