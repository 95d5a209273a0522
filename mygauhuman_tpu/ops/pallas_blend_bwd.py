"""Pallas TPU blend BACKWARD kernel.

Replaces the jnp-blend autodiff backward (dense [T, K, P] rematerialization)
with a recompute-based two-pass kernel mirroring the reference CUDA backward
(backward.cu:399-587) in TPU form:

  pass 1 (front-to-back): recompute per-chunk alphas, record each chunk's
    starting log-transmittance in VMEM scratch (the `final_T` residual
    generalized per chunk; no n_contrib bookkeeping needed — see
    ops/blend.py for the early-termination equivalence argument).
  pass 2 (back-to-front): recompute alphas, reconstruct T_before from the
    recorded log T, and accumulate
       dL/da_i = T_i q_i - (S_i + T_final g_T) / (1 - a_i)
    where q_i = f_i.g_color + g_alpha + depth_i g_depth and S_i is the
    suffix sum of w_j q_j over later instances (reverse lane-cumsum within
    the chunk + a carry across chunks) — the same suffix-accumulation trick
    as the CUDA back-to-front replay, vectorized over lanes.

Per-instance gradients are written to an instance-major [NS, G] matrix
(instances on the SUBLANE axis: each instance's G gradient components are
contiguous, which is what makes the downstream per-Gaussian row-gather
reduction fast — XLA's gather emitter needs gather-dim-major operands) with
read-modify-write DMAs (chunk-aligned windows can overlap the neighboring
tile's rows; the sequential grid makes RMW exact), then reduced per Gaussian
OUTSIDE the kernel by inverting the binning sort — deterministic, no atomics
(SURVEY.md §7.3 "atomic-free deterministic gradient reduction").

Gradient-row layout (G = 8 + C, matching the forward's input layout):
  0 d_x | 1 d_y | 2 d_cxx | 3 d_cxy | 4 d_cyy | 5 d_op | 6 d_depth | 7 pad
  | 8.. d_feat
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mygauhuman_tpu.ops.pallas_blend import HDR, LANE, _lane_cumsum


def _lane_reverse_cumsum_exclusive(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive suffix sum along lanes: out[i] = sum_{j>i} x[j]."""
    total = jnp.sum(x, axis=1, keepdims=True)
    inclusive = _lane_cumsum(x)          # sum_{j<=i}
    return total - inclusive


def _blend_bwd_kernel(
    starts_ref, counts_ref, tile_base_ref,   # scalar prefetch
    data_ref,                     # [D, NS] instance data in HBM (ANY)
    cot_ref,                      # [TB, P, c_out] cotangents block per step
    grad_init_ref,                # zero-init input, aliased to grad_ref
    grad_ref,                     # [NS, G] instance grads in HBM (ANY), RMW
    chunk_buf, gbuf, rmw_buf, logt_buf,
    sem, sem_r, sem_w,
    *,
    tile_w: int,
    tile_h: int,
    tiles_x: int,
    n_feat: int,
    chunk: int,
    tiles_per_step: int,
    max_chunks: int,
    g_out: int,
):
    """DMA-pipelined two-pass backward (the forward's round-4 treatment,
    measured variant by variant on the chip):

      * pass 1 stays SERIAL into slot 0 — both a cross-tile chunk-0
        prefetch (the forward's biggest win) and a double-buffered pass-1
        loop REGRESSED the step 6.6 -> 9.6 ms at the bench operating
        point: the extra queued DMAs delay pass 2's serially-dependent
        RMW reads (the forward has no competing RMW stream). Measured,
        not assumed — see PERF.md round-5 backward notes.
      * pass 2 reuses the RESIDENT last chunk (pass 1's serial loop ends
        with chunk k_chunks-1 in slot 0), so the dominant
        1-chunk-per-tile case runs pass 2 with ZERO data DMAs; deeper
        tiles double-buffer their remaining loads.
      * the pass-2 grad read-modify-write is pipelined on two slots: the
        next chunk's grad-row read and the previous chunk's write-back
        both overlap the current chunk's math. RMW windows of DIFFERENT
        chunks never alias (chunk-aligned, disjoint); windows of
        ADJACENT TILES can — each tile drains its outstanding writes
        before returning, and the grid is sequential, so cross-tile RMW
        stays exact."""
    P = tile_w * tile_h
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    pix_x = (pix % tile_w).astype(jnp.float32)
    pix_y = (pix // tile_w).astype(jnp.float32)

    def one_tile(ti):
        # program_id / scalar reads must happen outside the pl.when branch
        t = pl.program_id(0) * tiles_per_step + ti
        start = starts_ref[t]
        count = counts_ref[t]

        # empty tiles contribute no gradients (output is zero-initialized
        # via the aliased input) — skip both passes entirely
        @pl.when(count > 0)
        def _():
            _bwd_nonempty(ti, t, start, count)

    def _bwd_nonempty(ti, t, start, count):
        base0 = (start // chunk) * chunk
        offset = start - base0
        n_chunks = pl.cdiv(offset + count, chunk)

        tg = tile_base_ref[0] + t      # global tile id (shard strip offset)
        x0 = ((tg % tiles_x) * tile_w).astype(jnp.float32)
        y0 = ((tg // tiles_x) * tile_h).astype(jnp.float32)
        px = x0 + pix_x
        py = y0 + pix_y

        # cotangents for this tile
        g_color = cot_ref[ti, :, :n_feat]                  # [P, C]
        g_alpha = cot_ref[ti, :, n_feat:n_feat + 1]        # [P, 1]
        g_depth = cot_ref[ti, :, n_feat + 1:n_feat + 2]
        g_final_t = cot_ref[ti, :, n_feat + 2:n_feat + 3]

        def dma(ci, slot):
            base = pl.multiple_of(base0 + ci * chunk, chunk)
            return pltpu.make_async_copy(
                data_ref.at[:, pl.ds(base, chunk)],
                chunk_buf.at[slot],
                sem.at[slot],
            )

        def chunk_alphas(rd, ci):
            """Alpha math for one resident chunk; rd(lo, hi) reads rows
            [lo, hi) of its [D, chunk] buffer."""
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
            raw = op * jnp.exp(power)
            alpha = jnp.minimum(0.99, raw)
            ok = (power <= 0.0) & (alpha >= 1.0 / 255.0)
            a = jnp.where(ok, alpha, 0.0) * in_range
            return a, (dx, dy, power, raw, ok, in_range)

        # ---- pass 1: record each chunk's starting FULL-cumprod log T
        # (log_t_all — drives the include test; see the two-carry note in
        # ops/pallas_blend.py::_accumulate_tile) and accumulate the
        # included-only log_t_inc for final_t. Early-terminates exactly
        # like the forward: once every pixel's log_t_all < log(1e-4) all
        # later instances fail the include test — their gradients are
        # exactly zero, so both passes skip those chunks (and must: their
        # logt_buf rows are stale scratch from the previous tile).
        log_eps = jnp.float32(-9.210340371976182)   # log(1e-4)

        def p1_math(rd, ci, log_t_all, log_t_inc):
            a, _ = chunk_alphas(rd, ci)
            l1ma = jnp.log1p(-a)
            cum = _lane_cumsum(l1ma) + log_t_all
            include = (a > 0.0) & (jnp.exp(cum) >= 1e-4)
            return (
                log_t_all + jnp.sum(l1ma, axis=1, keepdims=True),
                log_t_inc + jnp.sum(jnp.where(include, l1ma, 0.0),
                                    axis=1, keepdims=True),
            )

        zero1 = jnp.zeros((P, 1), jnp.float32)

        def fwd_cond(st):
            ci, log_t_all, _ = st
            return (ci < n_chunks) & (jnp.max(log_t_all) >= log_eps)

        def fwd_body(st):
            ci, log_t_all, log_t_inc = st
            d = dma(ci, 0)
            d.start()
            d.wait()
            logt_buf[ci, :] = log_t_all[:, 0]
            log_t_all, log_t_inc = p1_math(
                lambda lo, hi: chunk_buf[0, lo:hi, :], ci,
                log_t_all, log_t_inc,
            )
            return ci + 1, log_t_all, log_t_inc

        k_chunks, _, log_t_inc = jax.lax.while_loop(
            fwd_cond, fwd_body, (jnp.zeros((), jnp.int32), zero1, zero1)
        )

        final_t = jnp.exp(log_t_inc)                        # [P, 1]
        tail = final_t * g_final_t                          # [P, 1]

        # ---- pass 2: back-to-front gradient accumulation (k_chunks only;
        # the skipped tail's grad rows stay zero via the aliased zero init)
        def grad_rd(ci, slot):
            base = pl.multiple_of(base0 + ci * chunk, chunk)
            return pltpu.make_async_copy(
                grad_ref.at[pl.ds(base, chunk), :],
                rmw_buf.at[slot],
                sem_r.at[slot],
            )

        def grad_wr(ci, slot):
            base = pl.multiple_of(base0 + ci * chunk, chunk)
            return pltpu.make_async_copy(
                rmw_buf.at[slot],
                grad_ref.at[pl.ds(base, chunk), :],
                sem_w.at[slot],
            )

        # warm-up: chunk k_chunks-1 is already RESIDENT in slot 0 (pass 1's
        # serial loop loads every chunk into slot 0, ending with the last
        # one) — pass 2's first iteration needs no data DMA at all. At the
        # ~1-chunk-per-tile operating point that removes one of the two
        # serial chunk loads per nonempty tile.
        grad_rd(k_chunks - 1, 0).start()

        def bwd_body(k, s_carry):
            ci = k_chunks - 1 - k
            slot = jax.lax.rem(k, 2)

            # prefetch chunk ci-1 into the other slot; its rmw_buf slot is
            # free once the write issued at k-1 (same slot) completes
            @pl.when(k + 1 < k_chunks)
            def _():
                @pl.when(k >= 1)
                def _():
                    grad_wr(ci + 1, 1 - slot).wait()

                dma(ci - 1, 1 - slot).start()
                grad_rd(ci - 1, 1 - slot).start()

            @pl.when(k >= 1)
            def _():
                dma(ci, slot).wait()

            def rd(lo, hi):
                return chunk_buf[slot, lo:hi, :]

            a, (dx, dy, power, raw, ok, in_range) = chunk_alphas(rd, ci)
            l1ma = jnp.log1p(-a)
            log_t_start = logt_buf[ci, :][:, None]          # [P, 1]
            cum = _lane_cumsum(l1ma) + log_t_start
            t_after = jnp.exp(cum)
            t_before = jnp.exp(cum - l1ma)
            include = (a > 0.0) & (t_after >= 1e-4)
            w = jnp.where(include, a * t_before, 0.0)       # [P, chunk]

            feat = rd(HDR, None)                            # [Cp, chunk]
            dep = rd(6, 7)
            # q = f.g_color + g_alpha + depth*g_depth : [P, chunk]
            q = jax.lax.dot_general(
                g_color, feat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + g_alpha + dep * g_depth
            wq = w * q

            s_local = _lane_reverse_cumsum_exclusive(wq)    # [P, chunk]
            s_total = s_local + s_carry                     # + later chunks

            one_m_a = jnp.maximum(1.0 - a, 1e-6)
            # gate the whole gradient by `include`: non-included instances
            # have w == 0, are outside final_t's product, and (by the
            # monotone-T argument) only feed other non-included instances —
            # their exact autodiff gradient is zero.
            da = jnp.where(
                include,
                t_before * q - (s_total + tail) / one_m_a,
                0.0,
            )

            # chain through a = min(0.99, op*exp(power)), gated by ok
            live = (raw < 0.99) & ok & (in_range > 0)
            d_raw = jnp.where(live, da, 0.0)
            op = rd(5, 6)
            cxx = rd(2, 3)
            cxy = rd(3, 4)
            cyy = rd(4, 5)
            e_p = jnp.exp(power)
            d_op_px = d_raw * e_p                            # [P, chunk]
            d_power = d_raw * op * e_p
            d_dx = d_power * (-(cxx * dx + cxy * dy))
            d_dy = d_power * (-(cyy * dy + cxy * dx))
            d_cxx = d_power * (-0.5 * dx * dx)
            d_cxy = d_power * (-dx * dy)
            d_cyy = d_power * (-0.5 * dy * dy)

            # per-instance reductions (sum over pixels)
            def psum(x):
                return jnp.sum(x, axis=0, keepdims=True)     # [1, chunk]

            # feature grads: [Cp, chunk] = g_color^T @ w
            d_feat = jax.lax.dot_general(
                g_color, w,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            d_dep = psum(w * g_depth)

            gbuf[0:1, :] = psum(d_dx)
            gbuf[1:2, :] = psum(d_dy)
            gbuf[2:3, :] = psum(d_cxx)
            gbuf[3:4, :] = psum(d_cxy)
            gbuf[4:5, :] = psum(d_cyy)
            gbuf[5:6, :] = psum(d_op_px)
            gbuf[6:7, :] = d_dep
            gbuf[7:8, :] = jnp.zeros((1, chunk), jnp.float32)
            gbuf[HDR:, :] = d_feat

            # accumulate into the chunk's grad rows (instance-major
            # [NS, G]: transpose the [G, chunk] staging block — cheap VREG
            # shuffles — so each instance's gradient row lands contiguous);
            # the write-back is NOT waited here — it overlaps the next
            # chunk's math and is drained at k+1 / after the loop.
            grad_rd(ci, slot).wait()
            row = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
            grow = ci * chunk + row
            mask = (grow >= offset) & (grow < offset + count)
            gt = jnp.transpose(gbuf[...])               # [chunk, D]
            if g_out > gt.shape[1]:
                # lane-pad to the DMA-aligned width (HBM slices must align
                # to 128-lane tiles)
                gt = jnp.concatenate(
                    [gt, jnp.zeros((chunk, g_out - gt.shape[1]),
                                   jnp.float32)], axis=1
                )
            rmw_buf[slot] = rmw_buf[slot] + jnp.where(mask, gt, 0.0)
            grad_wr(ci, slot).start()

            return s_carry + jnp.sum(wq, axis=1, keepdims=True)

        jax.lax.fori_loop(0, k_chunks, bwd_body, zero1)

        # drain the tile's outstanding writes: iterations k_chunks-1 and
        # (when it exists) k_chunks-2 — earlier writes were waited at k+1.
        # Adjacent tiles' RMW windows can alias, so the next tile must not
        # start until these land.
        @pl.when(k_chunks >= 2)
        def _():
            grad_wr(
                k_chunks - 1 - (k_chunks - 2),
                jax.lax.rem(k_chunks - 2, 2),
            ).wait()

        grad_wr(0, jax.lax.rem(k_chunks - 1, 2)).wait()

    for ti in range(tiles_per_step):
        one_tile(ti)


@functools.partial(
    jax.jit,
    static_argnames=("n_tiles", "tiles_x", "tile_w", "tile_h", "chunk",
                     "interpret"),
)
def blend_tiles_bwd_raw(
    data: jnp.ndarray,       # [D, NS] forward instance matrix (padded)
    starts: jnp.ndarray,     # [n_tiles]
    counts: jnp.ndarray,     # [n_tiles] (K-capped)
    tile_base: jnp.ndarray,  # [1] i32 — global index of local tile 0
    cotangents: jnp.ndarray,  # [n_tiles, P, c_out] (g_color, g_a, g_d, g_T)
    *,
    n_tiles: int,
    tiles_x: int,
    tile_w: int = 16,
    tile_h: int = 16,
    chunk: int = 2 * LANE,
    interpret: bool = False,
) -> jnp.ndarray:
    """Backward kernel over `n_tiles` consecutive tiles of a global grid ->
    instance-major grads [NS, ceil128(G)] (gradient components contiguous
    per instance, lane-padded for DMA alignment — callers slice [:, :G]).
    Shard-level entry (parallel/raster.py);
    blend_pallas_bwd_raw wraps with tile_base = 0."""
    T = n_tiles
    P = tile_w * tile_h
    D = data.shape[0]
    n_feat = D - HDR
    c_out = n_feat + 3
    NS = data.shape[1]
    max_chunks = NS // chunk + 1
    g_out = -(-D // 128) * 128   # HBM DMA slices must align to 128 lanes

    TB = 8
    while T % TB:
        TB //= 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T // TB,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # data
            pl.BlockSpec(
                (TB, P, c_out), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),                                       # cotangents
            pl.BlockSpec(memory_space=pl.ANY),       # zero-init grads (alias)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # grads stay in HBM
        scratch_shapes=[
            pltpu.VMEM((2, D, chunk), jnp.float32),   # double-buffered data
            pltpu.VMEM((D, chunk), jnp.float32),      # gbuf (grad staging)
            pltpu.VMEM((2, chunk, g_out), jnp.float32),  # pipelined RMW
            pltpu.VMEM((max_chunks, P), jnp.float32),  # per-chunk log T
            pltpu.SemaphoreType.DMA((2,)),            # data slots
            pltpu.SemaphoreType.DMA((2,)),            # grad-read slots
            pltpu.SemaphoreType.DMA((2,)),            # grad-write slots
        ],
    )
    kernel = functools.partial(
        _blend_bwd_kernel, tile_w=tile_w, tile_h=tile_h, tiles_x=tiles_x,
        n_feat=n_feat, chunk=chunk, tiles_per_step=TB, max_chunks=max_chunks,
        g_out=g_out,
    )
    zeros = jnp.zeros((NS, g_out), jnp.float32)
    # alias the zeros input to the output: the kernel accumulates into it
    # with read-modify-write DMAs (indices count scalar-prefetch args first)
    grads = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NS, g_out), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, counts, tile_base.astype(jnp.int32), data, cotangents, zeros)
    return grads


def blend_pallas_bwd_raw(
    data: jnp.ndarray,       # [D, NS] forward instance matrix (padded)
    starts: jnp.ndarray,     # [T]
    counts: jnp.ndarray,     # [T] (K-capped)
    cotangents: jnp.ndarray,  # [T, P, c_out] tile-major (g_color, g_a, g_d, g_T)
    *,
    width: int,
    height: int,
    tile_w: int = 16,
    tile_h: int = 16,
    chunk: int = 2 * LANE,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the backward kernel -> instance-major grads [NS, G]."""
    tw = -(-width // tile_w)
    th = -(-height // tile_h)
    return blend_tiles_bwd_raw(
        data, starts, counts, jnp.zeros((1,), jnp.int32), cotangents,
        n_tiles=tw * th, tiles_x=tw, tile_w=tile_w, tile_h=tile_h,
        chunk=chunk, interpret=interpret,
    )
