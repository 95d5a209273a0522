"""Pallas TPU kernel for the per-Gaussian LBS deform chain.

The componentwise SoA math of `models/lbs.py::coarse_deform_c2source`
(inverse big-pose skinning -> blendshape offsets -> forward skinning ->
global rigid) is mathematically cheap (~350 elementwise ops over [N]
vectors), but XLA's TPU backend materializes the chain as tuple fusions
in [N, 1] shapes with (8,128) tiles — 8 live values per 1024-slot tile —
and lowers several of them to the scalar path: at 64k capacity the chain
profiled at ~6-8 ms per train step (both branches), ~100x its
speed-of-light (PERF.md round-5 deform-kernel section). The same values
as explicit lane vectors in a Pallas kernel run the chain at full VPU
rate.

Layout contract (all component-major, lane-contiguous — no [N, 3]
minor-3 dimensions anywhere near the kernel):
  * `abig`, `asrc`: [12, N] blended joint transforms, rows
    (r00,r01,r02,t0, r10,r11,r12,t1, r20,r21,r22,t2) — exactly the
    [12, N] component-major product of lbs.py::blend_A's MXU einsum.
  * `packed`: [9, N], rows (q0,q1,q2, n0,n1,n2, off0,off1,off2) where
    off = -pose_offset(big) + shape_offset + pose_offset(target).
  * `scalars`: [1, 32]: rg row-major 9, rg_inv row-major 9, Th 3, pad.
  * output: [21, N], rows (smpl 3, world 3, transforms row-major 9,
    translation 3, world_normal 3); world/translation include +Th.

Gradients: `deform_rows` carries a custom_vjp whose backward re-derives
the chain with jax.vjp over the pure-jnp `_deform_rows_jnp` — identical
math, so fwd(pallas)+bwd(jnp) equals fwd(jnp)+bwd(jnp) exactly; the
forward (which the profile showed dominating) runs in the kernel.

Reference: scene/gaussian_model.py:768-872 (coarse_deform_c2source).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _deform_math(ab, as_, pk, sc):
    """The deform chain on component rows.

    ab/as_: 12 rows, pk: 9 rows (see module docstring), sc: 21+ traced
    scalars (rg 9, rg_inv 9, th 3). Rows may be [N] (jnp path) or
    [1, B] (kernel path) — the math is shape-agnostic elementwise.
    Returns 21 output rows. Mirrors models/lbs.py exactly, op for op.
    """
    (b00, b01, b02, bt0, b10, b11, b12, bt1, b20, b21, b22, bt2) = ab
    (s00, s01, s02, st0, s10, s11, s12, st1, s20, s21, s22, st2) = as_
    q0, q1, q2, n0, n1, n2, o0, o1, o2 = pk
    rg = sc[0:9]
    rgi = sc[9:18]
    th = sc[18:21]

    # inv3x3 of the big-pose blend (adjugate with the lbs.py det guard)
    A = b11 * b22 - b12 * b21
    B_ = b02 * b21 - b01 * b22
    C = b01 * b12 - b02 * b11
    D = b12 * b20 - b10 * b22
    E = b00 * b22 - b02 * b20
    F = b02 * b10 - b00 * b12
    G = b10 * b21 - b11 * b20
    H = b01 * b20 - b00 * b21
    I = b00 * b11 - b01 * b10
    det = b00 * A + b01 * D + b02 * G
    det = jnp.where(jnp.abs(det) < 1e-8, jnp.sign(det) * 1e-8 + 1e-12, det)
    inv = 1.0 / det
    r = (A * inv, B_ * inv, C * inv, D * inv, E * inv, F * inv,
         G * inv, H * inv, I * inv)

    def mat_vec(m, v):
        m00, m01, m02, m10, m11, m12, m20, m21, m22 = m
        v0, v1, v2 = v
        return (m00 * v0 + m01 * v1 + m02 * v2,
                m10 * v0 + m11 * v1 + m12 * v2,
                m20 * v0 + m21 * v1 + m22 * v2)

    def mat_mat(a, b):
        a00, a01, a02, a10, a11, a12, a20, a21, a22 = a
        b00_, b01_, b02_, b10_, b11_, b12_, b20_, b21_, b22_ = b
        return (
            a00 * b00_ + a01 * b10_ + a02 * b20_,
            a00 * b01_ + a01 * b11_ + a02 * b21_,
            a00 * b02_ + a01 * b12_ + a02 * b22_,
            a10 * b00_ + a11 * b10_ + a12 * b20_,
            a10 * b01_ + a11 * b11_ + a12 * b21_,
            a10 * b02_ + a11 * b12_ + a12 * b22_,
            a20 * b00_ + a21 * b10_ + a22 * b20_,
            a20 * b01_ + a21 * b11_ + a22 * b21_,
            a20 * b02_ + a21 * b12_ + a22 * b22_,
        )

    # big pose -> T pose, then the combined blendshape offset
    x = mat_vec(r, (q0 - bt0, q1 - bt1, q2 - bt2))
    nrm = mat_vec(r, (n0, n1, n2))
    translation = mat_vec(r, (-bt0, -bt1, -bt2))
    x = (x[0] + o0, x[1] + o1, x[2] + o2)
    translation = (translation[0] + o0, translation[1] + o1,
                   translation[2] + o2)

    # T pose -> target pose
    rs = (s00, s01, s02, s10, s11, s12, s20, s21, s22)
    sp = mat_vec(rs, x)
    smpl = (sp[0] + st0, sp[1] + st1, sp[2] + st2)
    nrm = mat_vec(rs, nrm)
    tf = mat_mat(rs, r)
    tr = mat_vec(rs, translation)
    tr = (tr[0] + st0, tr[1] + st1, tr[2] + st2)

    # SMPL -> world (x @ Rg_inv convention, as lbs.py apply_rg_inv)
    def apply_rgi(v):
        v0, v1, v2 = v
        return (v0 * rgi[0] + v1 * rgi[3] + v2 * rgi[6],
                v0 * rgi[1] + v1 * rgi[4] + v2 * rgi[7],
                v0 * rgi[2] + v1 * rgi[5] + v2 * rgi[8])

    wp = apply_rgi(smpl)
    wn = apply_rgi(nrm)
    tf = mat_mat(rg, tf)
    trw = apply_rgi(tr)

    return (smpl[0], smpl[1], smpl[2],
            wp[0] + th[0], wp[1] + th[1], wp[2] + th[2],
            *tf,
            trw[0] + th[0], trw[1] + th[1], trw[2] + th[2],
            wn[0], wn[1], wn[2])


def _deform_rows_jnp(abig, asrc, packed, scalars):
    """Pure-jnp reference (CPU path + the custom_vjp backward)."""
    sc = [scalars[0, i] for i in range(21)]
    rows = _deform_math([abig[k] for k in range(12)],
                        [asrc[k] for k in range(12)],
                        [packed[k] for k in range(9)], sc)
    return jnp.stack(rows, axis=0)


def _kernel(ab_ref, as_ref, pk_ref, sc_ref, out_ref):
    ab = [ab_ref[k, :] for k in range(12)]
    as_ = [as_ref[k, :] for k in range(12)]
    pk = [pk_ref[k, :] for k in range(9)]
    sc = [sc_ref[0, i] for i in range(21)]
    rows = _deform_math(ab, as_, pk, sc)
    for k in range(21):
        out_ref[k, :] = rows[k]


def _deform_rows_pallas(abig, asrc, packed, scalars, *, block: int = 4096,
                        interpret: bool = False):
    N = abig.shape[1]
    B = min(block, N)
    # The math is lane-independent, so a non-multiple N (e.g. the serving
    # path's compacted capacities, which are multiples of 128 but not of
    # the block) is handled by edge-padding the lane axis and slicing the
    # result — edge values keep the padded lanes on the same numeric path
    # as real ones (no 0-matrix inversions).
    Np = -(-N // B) * B
    if Np != N:
        pad = lambda a: jnp.pad(a, ((0, 0), (0, Np - N)), mode="edge")
        abig, asrc, packed = pad(abig), pad(asrc), pad(packed)
    out = pl.pallas_call(
        _kernel,
        grid=(Np // B,),
        in_specs=[
            pl.BlockSpec((12, B), lambda i: (0, i)),
            pl.BlockSpec((12, B), lambda i: (0, i)),
            pl.BlockSpec((9, B), lambda i: (0, i)),
            pl.BlockSpec((1, 32), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((21, B), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((21, Np), jnp.float32),
        interpret=interpret,
    )(abig, asrc, packed, scalars)
    return out[:, :N] if Np != N else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def deform_rows(abig, asrc, packed, scalars, impl: str = "auto"):
    """[12,N] x [12,N] x [9,N] x [1,32] -> [21,N] (see module docstring).

    impl: "auto" (pallas on TPU, jnp elsewhere), "pallas", "interpret",
    "jnp".
    """
    return _fwd_impl(abig, asrc, packed, scalars, impl)


def _fwd_impl(abig, asrc, packed, scalars, impl):
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if impl == "jnp":
        return _deform_rows_jnp(abig, asrc, packed, scalars)
    if abig.shape[1] % 128 != 0:        # pallas lane constraint
        return _deform_rows_jnp(abig, asrc, packed, scalars)
    return _deform_rows_pallas(abig, asrc, packed, scalars,
                               interpret=(impl == "interpret"))


def _deform_fwd(abig, asrc, packed, scalars, impl):
    return _fwd_impl(abig, asrc, packed, scalars, impl), (
        abig, asrc, packed, scalars)


def _deform_bwd(impl, res, g):
    abig, asrc, packed, scalars = res
    _, vjp = jax.vjp(_deform_rows_jnp, abig, asrc, packed, scalars)
    return vjp(g)


deform_rows.defvjp(_deform_fwd, _deform_bwd)
