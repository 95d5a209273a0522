"""Canonical-to-posed LBS deformation of Gaussians — the heart of GauHuman.

Functional equivalent of `GaussianModel.coarse_deform_c2source`
(scene/gaussian_model.py:768-872) and `get_transform_params_torch`
(:966-997): take Gaussians living in the canonical *big pose* space, undo the
big pose to the T-pose (inverse skinning), remove/add blendshape offsets,
re-skin to the target pose (with learned per-joint correction rotations
folded in), then apply the global rigid transform to world space.

Everything is pure jnp on static shapes — one fused jit region per frame.
The per-Gaussian 3x3 `transforms` output conjugates covariances
(Sigma' = T Sigma T^T) and rotates normals; `translation` lets eval replay
cached deformations without the MLPs (render.py:169-195 parity).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mygauhuman_tpu.models.smpl import (
    SMPLModel,
    remove_rest_joint_translation,
    rigid_transform_chain,
)
from mygauhuman_tpu.ops.knn import knn
from mygauhuman_tpu.utils.transforms import inv3x3, rodrigues


class DeformOutput(NamedTuple):
    smpl_pts: jnp.ndarray       # [N, 3] posed points in SMPL space
    world_pts: jnp.ndarray      # [N, 3] posed points in world space
    bweights: jnp.ndarray       # [N, 24] blend weights actually used
    transforms: jnp.ndarray     # [N, 3, 3] world rotation applied to each Gaussian
    translation: jnp.ndarray    # [N, 3] matching translation (world = T x + t)
    world_normals: jnp.ndarray  # [N, 3]


def apply_correct_rs(rot_mats: jnp.ndarray, correct_Rs: jnp.ndarray | None) -> jnp.ndarray:
    """Fold learned per-joint correction rotations into non-root joints.

    Parity: gaussian_model.py:836-839 / :985-988.
    """
    if correct_Rs is None:
        return rot_mats
    corrected = jnp.matmul(rot_mats[1:], correct_Rs,
                           precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([rot_mats[:1], corrected], axis=0)


def transform_params(
    model: SMPLModel,
    params: dict,
    rot_mats: jnp.ndarray | None = None,
    correct_Rs: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-joint rest->posed rigid transforms A [24,4,4] and rest joints.

    Parity: get_transform_params_torch (gaussian_model.py:966-997).
    """
    # Position math runs at full-f32 matmul precision throughout this
    # module: JAX's default TPU matmul precision is bf16, whose ~0.4%
    # relative error moves projected Gaussians by ~1 px at 512^2 (measured
    # 0.099 max color drift vs the f32 reference render). The FLOPs here
    # are negligible, so HIGHEST costs nothing.
    v_shaped = model.v_template + jnp.einsum(
        "vdb,b->vd", model.shapedirs, params["shapes"].reshape(-1),
        precision=jax.lax.Precision.HIGHEST,
    )
    joints = jnp.matmul(model.j_regressor, v_shaped,
                        precision=jax.lax.Precision.HIGHEST)
    if rot_mats is None:
        rot_mats = rodrigues(params["poses"].reshape(-1, 3))
        rot_mats = apply_correct_rs(rot_mats, correct_Rs)
    G = rigid_transform_chain(rot_mats, joints, model.parents)
    A = remove_rest_joint_translation(G, joints)
    return A, joints


def _pose_offsets(model: SMPLModel, rot_mats: jnp.ndarray) -> jnp.ndarray:
    """Per-vertex pose blendshape offsets [V,3] from (R - I) features."""
    ident = jnp.eye(3, dtype=rot_mats.dtype)
    feature = (rot_mats[1:] - ident).reshape(-1)  # [207]
    return jnp.einsum("vdp,p->vd", model.posedirs, feature,
                      precision=jax.lax.Precision.HIGHEST)


def coarse_deform_c2source(
    model: SMPLModel,
    query_pts: jnp.ndarray,            # [N, 3] canonical (big pose) Gaussians
    params: dict,                      # target frame: poses[72], shapes[B], R[3,3], Th[3]
    big_pose_params: dict,
    big_pose_verts: jnp.ndarray,       # [V, 3] canonical SMPL vertices
    lbs_offset: jnp.ndarray | None = None,   # [N, 24] learned weight-logit offsets
    correct_Rs: jnp.ndarray | None = None,   # [23, 3, 3] learned pose corrections
    normals: jnp.ndarray | None = None,      # [N, 3]
    vert_ids: jnp.ndarray | None = None,     # [N] precomputed nearest SMPL vertex
) -> DeformOutput:
    """Deform canonical Gaussians to the observed frame. See module docstring."""
    N = query_pts.shape[0]
    if normals is None:
        normals = jnp.zeros_like(query_pts)
    if vert_ids is None:
        _, idx = knn(query_pts, big_pose_verts, k=1)
        vert_ids = idx[:, 0]

    bweights = model.weights[vert_ids]  # [N, J]
    if lbs_offset is not None:
        bweights = jnp.log(bweights + 1e-9) + lbs_offset
        bweights = jnp.exp(bweights - jnp.max(bweights, axis=-1, keepdims=True))
        bweights = bweights / jnp.sum(bweights, axis=-1, keepdims=True)

    # All per-Gaussian matrix math below is componentwise over [N] slices —
    # batched [N,3,3]/[N,4,4] dot_generals materialize T(·,128)-padded
    # layouts that cost ~0.4-2 ms each at 64k capacity (see
    # utils/transforms.py SoA note). The blended joint transform comes out
    # of ONE MXU matmul in component-major [12, N] form.
    def blend_A(A):
        """[J,4,4] -> 12 components (r00,r01,r02,t0,...,t2), each [N]."""
        A_flat = A[:, :3, :].reshape(-1, 12)                  # [J, 12]
        A_ptT = jnp.einsum("jk,nj->kn", A_flat, bweights,     # [12, N]
                           precision=jax.lax.Precision.HIGHEST)
        return tuple(A_ptT[i] for i in range(12))

    def inv3x3_cols(a, b, c, d, e, f, g, h, i):
        """Componentwise adjugate inverse (same guard as inv3x3)."""
        A = e * i - f * h
        B = c * h - b * i
        C = b * f - c * e
        D = f * g - d * i
        E = a * i - c * g
        F = c * d - a * f
        G = d * h - e * g
        H = b * g - a * h
        I = a * e - b * d
        det = a * A + b * D + c * G
        det = jnp.where(jnp.abs(det) < 1e-8, jnp.sign(det) * 1e-8 + 1e-12, det)
        inv = 1.0 / det
        return (A * inv, B * inv, C * inv, D * inv, E * inv, F * inv,
                G * inv, H * inv, I * inv)

    def mat_vec(m, v):
        """9-component matrix tuple x 3-component vector tuple."""
        m00, m01, m02, m10, m11, m12, m20, m21, m22 = m
        v0, v1, v2 = v
        return (m00 * v0 + m01 * v1 + m02 * v2,
                m10 * v0 + m11 * v1 + m12 * v2,
                m20 * v0 + m21 * v1 + m22 * v2)

    def mat_mat(a, b):
        a00, a01, a02, a10, a11, a12, a20, a21, a22 = a
        b00, b01, b02, b10, b11, b12, b20, b21, b22 = b
        return (
            a00 * b00 + a01 * b10 + a02 * b20,
            a00 * b01 + a01 * b11 + a02 * b21,
            a00 * b02 + a01 * b12 + a02 * b22,
            a10 * b00 + a11 * b10 + a12 * b20,
            a10 * b01 + a11 * b11 + a12 * b21,
            a10 * b02 + a11 * b12 + a12 * b22,
            a20 * b00 + a21 * b10 + a22 * b20,
            a20 * b01 + a21 * b11 + a22 * b21,
            a20 * b02 + a21 * b12 + a22 * b22,
        )

    def vcols(v):
        return (v[..., 0], v[..., 1], v[..., 2])

    # --- Big pose -> T pose (inverse skinning).
    A_big, _ = transform_params(model, big_pose_params)
    (b00, b01, b02, bt0, b10, b11, b12, bt1, b20, b21, b22, bt2) = blend_A(A_big)
    R_inv = inv3x3_cols(b00, b01, b02, b10, b11, b12, b20, b21, b22)
    q0, q1, q2 = vcols(query_pts)
    x = mat_vec(R_inv, (q0 - bt0, q1 - bt1, q2 - bt2))
    nrm = mat_vec(R_inv, vcols(normals))
    transforms_c = R_inv
    translation = mat_vec(R_inv, (-bt0, -bt1, -bt2))

    # --- Blendshape corrections (mean_shape branch, always on in reference).
    big_rot_mats = rodrigues(big_pose_params["poses"].reshape(-1, 3))
    po_big = vcols(_pose_offsets(model, big_rot_mats)[vert_ids])
    x = tuple(xi - oi for xi, oi in zip(x, po_big))
    translation = tuple(ti - oi for ti, oi in zip(translation, po_big))

    shape_offset = vcols(jnp.einsum(
        "vdb,b->vd", model.shapedirs, params["shapes"].reshape(-1),
        precision=jax.lax.Precision.HIGHEST,
    )[vert_ids])
    x = tuple(xi + oi for xi, oi in zip(x, shape_offset))
    translation = tuple(ti + oi for ti, oi in zip(translation, shape_offset))

    rot_mats = rodrigues(params["poses"].reshape(-1, 3))
    rot_mats = apply_correct_rs(rot_mats, correct_Rs)
    po_tgt = vcols(_pose_offsets(model, rot_mats)[vert_ids])
    x = tuple(xi + oi for xi, oi in zip(x, po_tgt))
    translation = tuple(ti + oi for ti, oi in zip(translation, po_tgt))

    # --- T pose -> target pose (forward skinning with corrected rotations).
    A_src, _ = transform_params(model, params, rot_mats=rot_mats)
    (s00, s01, s02, st0, s10, s11, s12, st1, s20, s21, s22, st2) = blend_A(A_src)
    R_src = (s00, s01, s02, s10, s11, s12, s20, s21, s22)
    sp = mat_vec(R_src, x)
    smpl_c = (sp[0] + st0, sp[1] + st1, sp[2] + st2)
    nrm = mat_vec(R_src, nrm)
    transforms_c = mat_mat(R_src, transforms_c)
    tr = mat_vec(R_src, translation)
    translation = (tr[0] + st0, tr[1] + st1, tr[2] + st2)

    # --- SMPL space -> world (global rigid; R orthogonal so x@R^-1 == R x).
    Rg = params["R"]
    Rg_inv = inv3x3(Rg)
    Th = params["Th"].reshape(3)

    def apply_rg_inv(v):           # v @ Rg_inv + optional Th (componentwise)
        v0, v1, v2 = v
        return (
            v0 * Rg_inv[0, 0] + v1 * Rg_inv[1, 0] + v2 * Rg_inv[2, 0],
            v0 * Rg_inv[0, 1] + v1 * Rg_inv[1, 1] + v2 * Rg_inv[2, 1],
            v0 * Rg_inv[0, 2] + v1 * Rg_inv[1, 2] + v2 * Rg_inv[2, 2],
        )

    wp = apply_rg_inv(smpl_c)
    wn = apply_rg_inv(nrm)
    rg_c = (Rg[0, 0], Rg[0, 1], Rg[0, 2], Rg[1, 0], Rg[1, 1], Rg[1, 2],
            Rg[2, 0], Rg[2, 1], Rg[2, 2])
    transforms_c = mat_mat(rg_c, transforms_c)
    tr = apply_rg_inv(translation)

    def vstack(v):
        return jnp.stack(v, axis=-1)

    transforms = jnp.stack(
        [jnp.stack(transforms_c[0:3], axis=-1),
         jnp.stack(transforms_c[3:6], axis=-1),
         jnp.stack(transforms_c[6:9], axis=-1)],
        axis=-2,
    )
    return DeformOutput(
        smpl_pts=vstack(smpl_c),
        world_pts=vstack(wp) + Th,
        bweights=bweights,
        transforms=transforms,
        translation=vstack(tr) + Th,
        world_normals=vstack(wn),
    )
