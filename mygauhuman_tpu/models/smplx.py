"""SMPL-X body model: loader + big pose (DNA-Rendering path).

The reference vendors the full smplx package (smplx/body_models.py 2,450 LoC
+ lbs.py 405) but exercises only the SMPLX forward for DNA-Rendering
(scene/dataset_readers.py:1016-1057, SURVEY.md §2.12). Here SMPL-X loads
into the SAME `SMPLModel` pytree as SMPL — identical LBS math, just 55
joints, 486-dim pose basis and betas+expression shape dims — so the whole
deformation/rendering stack (models/lbs.py, renderer) works unchanged.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from mygauhuman_tpu.models.smpl import SMPLModel, _parents_from_kintree

NUM_JOINTS_SMPLX = 55
NUM_BODY_JOINTS = 21  # non-root body joints (body_pose is 63 = 21*3)


def load_smplx(
    model_path: str,
    gender: str = "neutral",
    num_betas: int = 10,
    num_expression: int = 10,
) -> SMPLModel:
    """Load SMPL-X .npz into the common SMPLModel pytree.

    `model_path` is either a directory (reference layout
    assets/models/smplx/SMPLX_{GENDER}.npz) or a direct .npz path. The shape
    basis becomes [V, 3, num_betas + num_expression] so the dataset readers'
    `shapes = concat(betas, expression)` convention (dataset_readers.py:1057)
    works directly.
    """
    if os.path.isdir(model_path):
        model_path = os.path.join(
            model_path, f"SMPLX_{gender.upper()}.npz"
        )
    data = dict(np.load(model_path, allow_pickle=True))

    shapedirs = np.asarray(data["shapedirs"], np.float32)
    if shapedirs.shape[-1] > 300:   # combined shape+expression basis
        shape_part = shapedirs[..., :num_betas]
        expr_part = shapedirs[..., 300:300 + num_expression]
    else:
        shape_part = shapedirs[..., :num_betas]
        expr_part = shapedirs[..., shapedirs.shape[-1] - num_expression:] \
            if shapedirs.shape[-1] >= num_betas + num_expression \
            else np.zeros(shapedirs.shape[:2] + (num_expression,), np.float32)
    shapedirs = np.concatenate([shape_part, expr_part], axis=-1)

    posedirs = np.asarray(data["posedirs"], np.float32)
    if posedirs.ndim == 3 and posedirs.shape[0] != shapedirs.shape[0]:
        # smplx stores [486, V*3]; reshape to [V, 3, 486]
        posedirs = posedirs.reshape(posedirs.shape[0], -1, 3)
        posedirs = np.moveaxis(posedirs, 0, -1)
    elif posedirs.ndim == 2:
        posedirs = posedirs.reshape(-1, 3, posedirs.shape[-1])

    j_reg = np.asarray(data["J_regressor"], np.float32)[:NUM_JOINTS_SMPLX]
    weights = np.asarray(data["lbs_weights"] if "lbs_weights" in data
                         else data["weights"], np.float32)
    weights = weights[:, :NUM_JOINTS_SMPLX]

    if "kintree_table" in data:
        parents = _parents_from_kintree(np.asarray(data["kintree_table"]))
    else:
        parents = np.asarray(data["parents"], np.int32)
    parents = parents[:NUM_JOINTS_SMPLX]

    return SMPLModel(
        v_template=jnp.asarray(np.asarray(data["v_template"], np.float32)),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs[..., : (NUM_JOINTS_SMPLX - 1) * 9]),
        j_regressor=jnp.asarray(j_reg),
        weights=jnp.asarray(weights),
        parents=parents,
        faces=np.asarray(data["f"], np.int32) if "f" in data
        else np.zeros((0, 3), np.int32),
    )


def smplx_full_pose(
    global_orient: np.ndarray,    # [3]
    body_pose: np.ndarray,        # [63]
    jaw_pose=None, leye_pose=None, reye_pose=None,
    left_hand_pose=None, right_hand_pose=None,
) -> np.ndarray:
    """Assemble the 165-dim full pose in smplx joint order:
    root(3) + body(63) + jaw(3) + leye(3) + reye(3) + lhand(45) + rhand(45).
    """
    z3 = np.zeros(3, np.float32)
    z45 = np.zeros(45, np.float32)
    return np.concatenate([
        np.asarray(global_orient, np.float32).reshape(-1),
        np.asarray(body_pose, np.float32).reshape(-1),
        np.asarray(jaw_pose if jaw_pose is not None else z3, np.float32).reshape(-1),
        np.asarray(leye_pose if leye_pose is not None else z3, np.float32).reshape(-1),
        np.asarray(reye_pose if reye_pose is not None else z3, np.float32).reshape(-1),
        np.asarray(left_hand_pose if left_hand_pose is not None else z45,
                   np.float32).reshape(-1),
        np.asarray(right_hand_pose if right_hand_pose is not None else z45,
                   np.float32).reshape(-1),
    ])


def smplx_big_pose_params(num_betas: int = 10, num_expression: int = 10) -> dict:
    """Canonical big pose for SMPL-X (dataset_readers.py:1033-1036: body_pose
    indices 2, 5, 20, 23 at 45/-45/-30/30 degrees)."""
    body = np.zeros(63, np.float32)
    body[2] = np.deg2rad(45.0)
    body[5] = np.deg2rad(-45.0)
    body[20] = np.deg2rad(-30.0)
    body[23] = np.deg2rad(30.0)
    poses = smplx_full_pose(np.zeros(3), body)
    return {
        "poses": jnp.asarray(poses),
        "shapes": jnp.zeros(num_betas + num_expression, jnp.float32),
        "R": jnp.eye(3, dtype=jnp.float32),
        "Th": jnp.zeros(3, jnp.float32),
    }


def synthetic_smplx(num_vertices: int = 400, seed: int = 0) -> SMPLModel:
    """Miniature 55-joint SMPL-X-topology model for tests."""
    from mygauhuman_tpu.models.smpl import synthetic_smpl

    rng = np.random.default_rng(seed)
    # standard SMPL-X parent table
    parents = np.array([
        -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
        18, 19, 15, 22, 23, 20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35,
        20, 37, 38, 21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52,
        53,
    ], np.int32)
    J = len(parents)
    joint_pos = np.zeros((J, 3), np.float32)
    for j in range(1, J):
        d = rng.normal(size=3)
        joint_pos[j] = joint_pos[parents[j]] + 0.08 * d / np.linalg.norm(d)
    owner = rng.integers(0, J, size=num_vertices)
    v_template = joint_pos[owner] + 0.03 * rng.normal(size=(num_vertices, 3))
    d = np.linalg.norm(v_template[:, None] - joint_pos[None], axis=-1)
    w = np.exp(-(d / 0.08) ** 2) + 1e-4
    keep2 = np.argsort(d, axis=1)[:, :2]
    mask = np.zeros_like(w)
    np.put_along_axis(mask, keep2, 1.0, axis=1)
    w = w * mask
    weights = (w / w.sum(axis=1, keepdims=True)).astype(np.float32)
    jr = np.zeros((J, num_vertices), np.float32)
    for j in range(J):
        sel = owner == j
        if sel.any():
            jr[j, sel] = 1.0 / sel.sum()
        else:
            jr[j, np.argsort(d[:, j])[:4]] = 0.25
    return SMPLModel(
        v_template=jnp.asarray(v_template.astype(np.float32)),
        shapedirs=jnp.asarray(
            0.01 * rng.normal(size=(num_vertices, 3, 20)).astype(np.float32)
        ),
        posedirs=jnp.asarray(
            0.001 * rng.normal(
                size=(num_vertices, 3, (J - 1) * 9)
            ).astype(np.float32)
        ),
        j_regressor=jnp.asarray(jr),
        weights=jnp.asarray(weights),
        parents=parents,
        faces=np.zeros((0, 3), np.int32),
    )
