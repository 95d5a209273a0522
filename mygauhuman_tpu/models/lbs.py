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

    # The per-Gaussian chain below runs componentwise over [N] lane
    # vectors — batched [N,3,3]/[N,4,4] dot_generals materialize
    # T(·,128)-padded layouts (see utils/transforms.py SoA note), and
    # even the SoA form gets scalar-lowered by the XLA TPU backend in
    # large step programs (~6-8 ms/step at 64k capacity, profiled). The
    # blended joint transforms come out of ONE MXU einsum each in
    # component-major [12, N] form, and the chain itself runs in the
    # Pallas kernel `ops/pallas_deform.py` (pure-jnp twin on CPU and in
    # the backward — identical math, tested).
    from mygauhuman_tpu.ops.pallas_deform import deform_rows

    def blend12(A):
        """[J,4,4] -> [12, N] components (r00,r01,r02,t0,...,t2)."""
        A_flat = A[:, :3, :].reshape(-1, 12)                  # [J, 12]
        return jnp.einsum("jk,nj->kn", A_flat, bweights,
                          precision=jax.lax.Precision.HIGHEST)

    A_big, _ = transform_params(model, big_pose_params)
    big_rot_mats = rodrigues(big_pose_params["poses"].reshape(-1, 3))
    rot_mats = rodrigues(params["poses"].reshape(-1, 3))
    rot_mats = apply_correct_rs(rot_mats, correct_Rs)
    A_src, _ = transform_params(model, params, rot_mats=rot_mats)

    # Blendshape corrections (mean_shape branch, always on in the
    # reference): -pose_offset(big) + shape_offset + pose_offset(target),
    # combined at VERTEX level so a single gather serves all three.
    shape_offset_v = jnp.einsum(
        "vdb,b->vd", model.shapedirs, params["shapes"].reshape(-1),
        precision=jax.lax.Precision.HIGHEST,
    )
    off_v = (-_pose_offsets(model, big_rot_mats) + shape_offset_v
             + _pose_offsets(model, rot_mats))
    off = off_v[vert_ids]                                     # [N, 3]

    Rg = params["R"]
    Rg_inv = inv3x3(Rg)
    Th = params["Th"].reshape(3)
    scalars = jnp.zeros((1, 32), jnp.float32)
    scalars = scalars.at[0, 0:9].set(Rg.reshape(-1))
    scalars = scalars.at[0, 9:18].set(Rg_inv.reshape(-1))
    scalars = scalars.at[0, 18:21].set(Th)

    packed = jnp.concatenate(
        [query_pts.T, normals.T, off.T], axis=0)              # [9, N]
    out = deform_rows(blend12(A_big), blend12(A_src), packed, scalars)

    return DeformOutput(
        smpl_pts=out[0:3].T,
        world_pts=out[3:6].T,
        bweights=bweights,
        transforms=out[6:15].T.reshape(N, 3, 3),
        translation=out[15:18].T,
        world_normals=out[18:21].T,
    )
