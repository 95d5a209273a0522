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
    corrected = rot_mats[1:] @ correct_Rs
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
    v_shaped = model.v_template + jnp.einsum(
        "vdb,b->vd", model.shapedirs, params["shapes"].reshape(-1)
    )
    joints = model.j_regressor @ v_shaped
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
    return jnp.einsum("vdp,p->vd", model.posedirs, feature)


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

    # --- Big pose -> T pose (inverse skinning).
    A_big, _ = transform_params(model, big_pose_params)
    A_pt = jnp.einsum("nj,jab->nab", bweights, A_big)  # [N, 4, 4]
    x = query_pts - A_pt[:, :3, 3]
    R_inv = inv3x3(A_pt[:, :3, :3])
    x = jnp.einsum("nab,nb->na", R_inv, x)
    nrm = jnp.einsum("nab,nb->na", R_inv, normals)
    transforms = R_inv
    translation = jnp.einsum("nab,nb->na", R_inv, -A_pt[:, :3, 3])

    # --- Blendshape corrections (mean_shape branch, always on in reference).
    big_rot_mats = rodrigues(big_pose_params["poses"].reshape(-1, 3))
    po_big = _pose_offsets(model, big_rot_mats)[vert_ids]
    x = x - po_big
    translation = translation - po_big

    shape_offset = jnp.einsum(
        "vdb,b->vd", model.shapedirs, params["shapes"].reshape(-1)
    )[vert_ids]
    x = x + shape_offset
    translation = translation + shape_offset

    rot_mats = rodrigues(params["poses"].reshape(-1, 3))
    rot_mats = apply_correct_rs(rot_mats, correct_Rs)
    po_tgt = _pose_offsets(model, rot_mats)[vert_ids]
    x = x + po_tgt
    translation = translation + po_tgt

    # --- T pose -> target pose (forward skinning with corrected rotations).
    A_src, _ = transform_params(model, params, rot_mats=rot_mats)
    A_pt = jnp.einsum("nj,jab->nab", bweights, A_src)
    R_src = A_pt[:, :3, :3]
    smpl_pts = jnp.einsum("nab,nb->na", R_src, x) + A_pt[:, :3, 3]
    nrm = jnp.einsum("nab,nb->na", R_src, nrm)
    transforms = R_src @ transforms
    translation = jnp.einsum("nab,nb->na", R_src, translation) + A_pt[:, :3, 3]

    # --- SMPL space -> world (global rigid; R orthogonal so x@R^-1 == R x).
    Rg = params["R"]
    Rg_inv = inv3x3(Rg)
    world_pts = smpl_pts @ Rg_inv + params["Th"].reshape(3)
    world_normals = nrm @ Rg_inv
    transforms = Rg @ transforms
    translation = translation @ Rg_inv + params["Th"].reshape(3)

    return DeformOutput(
        smpl_pts=smpl_pts,
        world_pts=world_pts,
        bweights=bweights,
        transforms=transforms,
        translation=translation,
        world_normals=world_normals,
    )
