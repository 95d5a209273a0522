"""Pallas TPU k-nearest-neighbors for SMALL reference sets (k <= 3).

The training hot path is LBS vertex lookup (ops/knn.py k=1: every Gaussian
-> nearest big-pose SMPL vertex, reference scene/gaussian_model.py:775 via
KNN_CUDA; SURVEY.md §2.3). The XLA formulation materializes each query
block's [Qb, R] distance matrix to HBM between the matmul and the argmin
(1.8 GB of traffic at 65k x 6890 — 4.6 ms/step inside a lax.map while
loop). This kernel keeps the block in VMEM: grid over query blocks, refs
resident, one HIGHEST-precision MXU cross-term per block, k in-register
argmin passes. Exact-f32 parity with ops/knn.knn (same qn + rn - 2 q.r
formula, same first-occurrence tie-break).

Only worthwhile when the [B, R_pad] block fits VMEM — the dispatcher in
ops/knn.py routes R <= 16384 here and keeps the blocked-XLA path (which
handles any R) otherwise. Self-KNN over the full Gaussian capacity (KL
densify neighbors, mean-3NN init) happens at init/densify events, not in
the step, and stays on the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
BIG = 3e38   # plain float: jnp scalars become captured consts in kernels


def _knn_kernel(
    q_ref,        # [B, 3] query block
    refs_ref,     # [3, R_pad] resident (TRANSPOSED: components on sublanes)
    pen_ref,      # [1, R_pad] f32: 0 valid, BIG masked/pad
    out_d_ref,    # [B, k]
    out_i_ref,    # [B, k] i32
    *,
    k: int,
    block: int,
    r_pad: int,
    exclude_self: bool,
):
    # Cross term as a component-wise VPU fma chain, NOT a dot_general: the
    # K=3 contraction is degenerate on the MXU (K pads to 128, and HIGHEST
    # multiplies the waste 6x — measured SLOWER than the XLA path). Plain
    # f32 VPU math is exact, no precision knob needed.
    q = q_ref[...]                                   # [B, 3]
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]     # [B, 1]
    rx = refs_ref[0:1, :]                            # [1, R_pad]
    ry = refs_ref[1:2, :]
    rz = refs_ref[2:3, :]
    qn = qx * qx + qy * qy + qz * qz                 # [B, 1]
    rn = rx * rx + ry * ry + rz * rz                 # [1, R_pad]
    cross = qx * rx + qy * ry + qz * rz              # [B, R_pad]
    d2 = jnp.maximum(qn + rn - 2.0 * cross, 0.0) + pen_ref[...]
    col = jax.lax.broadcasted_iota(jnp.int32, (block, r_pad), 1)
    if exclude_self:
        row = pl.program_id(0) * block + jax.lax.broadcasted_iota(
            jnp.int32, (block, r_pad), 0
        )
        d2 = jnp.where(row == col, BIG, d2)

    for j in range(k):
        m = jnp.min(d2, axis=1, keepdims=True)       # [B, 1]
        # first-occurrence tie-break, matching jnp.argmin
        idx = jnp.min(
            jnp.where(d2 == m, col, r_pad), axis=1, keepdims=True
        )                                            # [B, 1]
        out_d_ref[:, j:j + 1] = m
        out_i_ref[:, j:j + 1] = idx
        if j + 1 < k:
            d2 = jnp.where(col == idx, BIG, d2)


@functools.partial(
    jax.jit,
    static_argnames=("k", "exclude_self", "block", "interpret"),
)
def knn_small_refs(
    queries: jnp.ndarray,            # [Q, 3] f32
    refs: jnp.ndarray,               # [R, 3] f32
    k: int,
    ref_mask: jnp.ndarray | None = None,   # [R] bool
    exclude_self: bool = False,
    block: int = 128,
    interpret: bool = False,
):
    """(dists2 [Q, k], idx [Q, k] i32), ascending — exact f32.

    NON-differentiable (like the reference's KNN_CUDA): pallas_call has no
    AD rule, and every in-tree caller consumes only the integer indices (or
    runs outside grad), so inputs are stop_gradient'ed here — without this
    the LBS train step fails to linearize when query points carry tangents.
    """
    Q = queries.shape[0]
    R = refs.shape[0]
    queries = jax.lax.stop_gradient(queries.astype(jnp.float32))
    refs = jax.lax.stop_gradient(refs.astype(jnp.float32))

    r_pad = -(-R // LANE) * LANE
    q_pad = -(-Q // block) * block
    if q_pad > Q:
        queries = jnp.pad(queries, ((0, q_pad - Q), (0, 0)))
    refs_p = jnp.pad(refs, ((0, r_pad - R), (0, 0)))
    pen = jnp.full((1, r_pad), BIG, jnp.float32)
    if ref_mask is not None:
        valid = jnp.pad(ref_mask.astype(bool), (0, r_pad - R))
        pen = jnp.where(valid[None, :], 0.0, BIG)
    else:
        pen = pen.at[:, :R].set(0.0)

    grid = q_pad // block
    kernel = functools.partial(
        _knn_kernel, k=k, block=block, r_pad=r_pad,
        exclude_self=exclude_self,
    )
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, 3), lambda i: (i, 0)),
            pl.BlockSpec((3, r_pad), lambda i: (0, 0)),
            pl.BlockSpec((1, r_pad), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block, k), lambda i: (i, 0)),
            pl.BlockSpec((block, k), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k), jnp.int32),
        ],
        interpret=interpret,
    )(queries, refs_p.T, pen)
    return out_d[:Q], out_i[:Q]
