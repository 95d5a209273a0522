"""SMPL body model: loader + jit-able forward (shape/pose blendshapes, LBS).

Parity targets: reference smpl/smpl_numpy.py:46-98 (the numpy forward used by
all dataset readers) and scene/gaussian_model.py:880-892 (SMPL_to_tensor key
set). SMPL-X .npz loading uses the same key names (the reference routes
SMPL-X through the identical LBS math, scene/gaussian_model.py:78-84).

Model files (SMPL_NEUTRAL.pkl etc.) are external assets the user supplies,
exactly as in the reference; `synthetic_smpl` builds a structurally faithful
miniature (24 joints, proper kinematic chain) for tests and demos.
"""
from __future__ import annotations

import functools
import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mygauhuman_tpu.utils.transforms import rodrigues

NUM_JOINTS = 24
NUM_POSE_BASIS = 207  # (24-1) * 9

# SMPL kinematic tree (kintree_table row 0 remapped to column indices —
# standard SMPL topology; synthetic models reuse it).
SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21],
    dtype=np.int32,
)


class SMPLModel(NamedTuple):
    """Constant tensors of one body model (a pytree of jnp arrays)."""

    v_template: jnp.ndarray   # [V, 3]
    shapedirs: jnp.ndarray    # [V, 3, B]
    posedirs: jnp.ndarray     # [V, 3, 207]
    j_regressor: jnp.ndarray  # [24, V]
    weights: jnp.ndarray      # [V, 24]
    parents: np.ndarray       # [24] static int (host-side; chain is unrolled)
    faces: np.ndarray         # [F, 3] host-side (meshing/normals only)


def _parents_from_kintree(kintree_table: np.ndarray) -> np.ndarray:
    id_to_col = {int(kintree_table[1, i]): i for i in range(kintree_table.shape[1])}
    parents = np.full(kintree_table.shape[1], -1, np.int32)
    for i in range(1, kintree_table.shape[1]):
        parents[i] = id_to_col[int(kintree_table[0, i])]
    return parents


def load_smpl(path: str, num_betas: int = 10) -> SMPLModel:
    """Load a SMPL .pkl (latin1 chumpy pickle) or SMPL-X style .npz."""
    if path.endswith(".npz"):
        data = dict(np.load(path, allow_pickle=True))
    else:
        with open(path, "rb") as f:
            u = pickle._Unpickler(f)
            u.encoding = "latin1"
            data = u.load()
    j_reg = data["J_regressor"]
    if hasattr(j_reg, "toarray"):
        j_reg = j_reg.toarray()
    shapedirs = np.asarray(data["shapedirs"], np.float32)[..., :num_betas]
    posedirs = np.asarray(data["posedirs"], np.float32)
    if posedirs.ndim == 2:  # some releases store [V*3, 207]
        posedirs = posedirs.reshape(-1, 3, posedirs.shape[-1])
    kintree = np.asarray(data["kintree_table"])
    return SMPLModel(
        v_template=jnp.asarray(np.asarray(data["v_template"], np.float32)),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(np.asarray(j_reg, np.float32)),
        weights=jnp.asarray(np.asarray(data["weights"], np.float32)),
        parents=_parents_from_kintree(kintree),
        faces=np.asarray(data["f"], np.int32) if "f" in data else np.zeros((0, 3), np.int32),
    )


def synthetic_smpl(num_vertices: int = 300, num_betas: int = 10, seed: int = 0) -> SMPLModel:
    """Structurally faithful miniature body model for tests.

    Real 24-joint SMPL topology; vertices scattered along the bone chain so
    the joint regressor and skinning weights are geometrically sensible.
    """
    rng = np.random.default_rng(seed)
    parents = SMPL_PARENTS
    # joint rest positions: a rough humanoid skeleton
    joint_pos = np.zeros((NUM_JOINTS, 3), np.float32)
    for j in range(1, NUM_JOINTS):
        direction = rng.normal(size=3)
        direction /= np.linalg.norm(direction)
        joint_pos[j] = joint_pos[parents[j]] + 0.15 * direction

    # vertices near bones, weighted to the 2 nearest joints
    owner = rng.integers(0, NUM_JOINTS, size=num_vertices)
    v_template = joint_pos[owner] + 0.05 * rng.normal(size=(num_vertices, 3))
    d = np.linalg.norm(v_template[:, None] - joint_pos[None], axis=-1)
    w = np.exp(-(d / 0.1) ** 2) + 1e-4
    keep2 = np.argsort(d, axis=1)[:, :2]
    mask = np.zeros_like(w)
    np.put_along_axis(mask, keep2, 1.0, axis=1)
    w = w * mask
    weights = (w / w.sum(axis=1, keepdims=True)).astype(np.float32)

    # joint regressor: soft assignment of vertices to their owning joint
    jr = np.zeros((NUM_JOINTS, num_vertices), np.float32)
    for j in range(NUM_JOINTS):
        sel = owner == j
        if sel.any():
            jr[j, sel] = 1.0 / sel.sum()
        else:  # fall back: nearest vertices
            nearest = np.argsort(d[:, j])[:4]
            jr[j, nearest] = 0.25
    # correct regressor so J_regressor @ v_template ~= joint_pos
    shapedirs = 0.01 * rng.normal(size=(num_vertices, 3, num_betas)).astype(np.float32)
    posedirs = 0.001 * rng.normal(size=(num_vertices, 3, NUM_POSE_BASIS)).astype(np.float32)
    return SMPLModel(
        v_template=jnp.asarray(v_template.astype(np.float32)),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(jr),
        weights=jnp.asarray(weights),
        parents=parents,
        faces=np.zeros((0, 3), np.int32),
    )


def big_pose_params(num_betas: int = 10) -> dict:
    """GauHuman canonical 'big pose' (45deg legs, -30deg knees spread).

    Parity: scene/dataset_readers.py:586-594.
    """
    poses = np.zeros(72, np.float32)
    poses[5] = np.deg2rad(45.0)
    poses[8] = np.deg2rad(-45.0)
    poses[23] = np.deg2rad(-30.0)
    poses[26] = np.deg2rad(30.0)
    return {
        "poses": jnp.asarray(poses),
        "shapes": jnp.zeros(num_betas, jnp.float32),
        "R": jnp.eye(3, dtype=jnp.float32),
        "Th": jnp.zeros(3, jnp.float32),
    }


def smpl_forward(
    model: SMPLModel,
    poses: jnp.ndarray,           # [72] axis-angle or [24, 3, 3] rotations
    shapes: jnp.ndarray,          # [B]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """SMPL forward: (vertices [V,3], posed joints [J,3]).

    Joint count is derived from the model (24 for SMPL, 55 for SMPL-X).

    Parity: smpl/smpl_numpy.py:46-98 — shape blendshapes, 207-dim lrotmin
    pose blendshapes, kinematic compose, LBS skinning.

    Jitted into ONE program (parents static, tensors traced): the eager
    op-by-op form paid a tiny-program compile + tunnel round trip per op —
    ~30 s per process start on the remote-TPU backend, and tiny programs
    sit below the persistent cache's compile-time floor so the cost
    recurred every run.
    """
    arrays = {
        "v_template": model.v_template,
        "shapedirs": model.shapedirs,
        "posedirs": model.posedirs,
        "j_regressor": model.j_regressor,
        "weights": model.weights,
    }
    parents = tuple(int(p) for p in model.parents)
    return _smpl_forward_core(parents, arrays, jnp.asarray(poses),
                              jnp.asarray(shapes))


@functools.partial(jax.jit, static_argnums=(0,))
def _smpl_forward_core(
    parents: tuple,
    arrays: dict,
    poses: jnp.ndarray,
    shapes: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    hi = jax.lax.Precision.HIGHEST
    v_shaped = arrays["v_template"] + jnp.einsum(
        "vdb,b->vd", arrays["shapedirs"], shapes, precision=hi
    )
    J = jnp.matmul(arrays["j_regressor"], v_shaped, precision=hi)  # [24, 3]

    if poses.ndim == 1:
        rot_mats = rodrigues(poses.reshape(-1, 3))
    else:
        rot_mats = poses
    ident = jnp.eye(3, dtype=v_shaped.dtype)
    lrotmin = (rot_mats[1:] - ident).reshape(-1)  # [(J-1)*9]
    v_posed = v_shaped + jnp.einsum("vdp,p->vd", arrays["posedirs"], lrotmin,
                                    precision=hi)

    G = rigid_transform_chain(rot_mats, J, np.asarray(parents))
    A = remove_rest_joint_translation(G, J)
    T = jnp.einsum("vj,jab->vab", arrays["weights"], A, precision=hi)  # [V, 4, 4]
    v_h = jnp.concatenate([v_posed, jnp.ones_like(v_posed[:, :1])], axis=-1)
    verts = jnp.einsum("vab,vb->va", T, v_h, precision=hi)[:, :3]
    joints = G[:, :3, 3]
    return verts, joints


def rigid_transform_chain(
    rot_mats: jnp.ndarray, joints: jnp.ndarray, parents: np.ndarray
) -> jnp.ndarray:
    """Compose per-joint local transforms down the kinematic tree -> [24,4,4].

    Parity: gaussian_model.py get_rigid_transformation_torch:924-944 (before
    the rest-joint subtraction). The 24-step chain is unrolled (static tree).
    """
    n_joints = len(parents)
    rel = joints.at[1:].add(-joints[np.asarray(parents[1:])])
    bottom = jnp.tile(jnp.array([[0.0, 0.0, 0.0, 1.0]], rot_mats.dtype), (n_joints, 1, 1))
    local = jnp.concatenate(
        [jnp.concatenate([rot_mats, rel[:, :, None]], axis=-1), bottom], axis=-2
    )  # [J, 4, 4]
    chain = [local[0]]
    for j in range(1, n_joints):
        chain.append(jnp.matmul(chain[int(parents[j])], local[j],
                                precision=jax.lax.Precision.HIGHEST))
    return jnp.stack(chain, axis=0)


def remove_rest_joint_translation(G: jnp.ndarray, joints: jnp.ndarray) -> jnp.ndarray:
    """A = G - pad(G @ [j_rest; 0]): makes A map *rest-space* points.

    Parity: get_rigid_transformation_torch:946-951 / smpl_numpy.py:88-96.
    """
    j_h = jnp.concatenate([joints, jnp.zeros_like(joints[:, :1])], axis=-1)
    posed = jnp.einsum("jab,jb->ja", G, j_h,
                       precision=jax.lax.Precision.HIGHEST)  # [24, 4]
    return G.at[:, :, 3].add(-posed)
