"""Build a full-scale RENDERABLE MonoCap-format dataset on disk.

The MonoCap sequences are licensed and absent here, so quality + wall
numbers for the reference's second published budget
(/root/reference/train_monocap.sh: 2,000 iterations, monocular train view)
come from a synthetic stand-in with an exactly known optimum, written in
the REAL on-disk MonoCap layout (annots.npy + images/<v>/<pose>.jpg +
mask/ + params/<pose>.npy + vertices/<pose>.npy — the layout
read_cameras_monocap expects, mirroring the reference
scene/dataset_readers.py monocap loader) and trained through the real
reader -> cli/train path.

Two passes so no camera/pose convention is re-derived by hand:
  1. write the layout with placeholder images, let the REAL reader build
     its TrainBatch list;
  2. render ground truth from a known Gaussian scene through those exact
     batches, rewrite the jpgs/masks in place.

Usage: python scripts/perf/_make_monocap_disk.py [root] (default
/tmp/monocap_disk/lan_synth — the dir name must contain "monocap" for
load_scene_info routing).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import os
import pickle
import sys
import time

import numpy as np

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/monocap_disk/lan_synth"
SIZE = int(os.environ.get("MC_SIZE", "512"))
N_VERTS = int(os.environ.get("MC_VERTS", "6890"))
N_VIEWS = 11            # view 0 = train (monocap default split), 1..10 test
TRAIN_POSES = list(range(0, 500, 5))       # pose_interval 5, pose_num 100
TEST_POSES = list(range(0, 510, 30))       # pose_interval 30, pose_num 17

t0 = time.time()


def tick(msg):
    print(f"[{time.time()-t0:6.1f}s] {msg}", flush=True)


import jax
import jax.numpy as jnp

from mygauhuman_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from mygauhuman_tpu.models import gaussians as G
from mygauhuman_tpu.models.smpl import (
    big_pose_params,
    smpl_forward,
    synthetic_smpl,
)
from mygauhuman_tpu.utils.transforms import inverse_sigmoid

model = synthetic_smpl(num_vertices=N_VERTS, seed=0)

os.makedirs(ROOT, exist_ok=True)

# ---- SMPL pkl for the train CLI (--smpl_model_path) ----
kintree = np.zeros((2, 24), np.int64)
kintree[1] = np.arange(24)
kintree[0] = np.asarray(model.parents)
kintree[0, 0] = 2**32 - 1
PKL = os.path.join(ROOT, "SMPL_NEUTRAL.pkl")
with open(PKL, "wb") as f:
    pickle.dump({
        "v_template": np.asarray(model.v_template),
        "shapedirs": np.asarray(model.shapedirs),
        "posedirs": np.asarray(model.posedirs).reshape(-1, 207),
        "J_regressor": np.asarray(model.j_regressor),
        "weights": np.asarray(model.weights),
        "kintree_table": kintree,
        "f": np.asarray(model.faces),
    }, f)

# ---- cameras: a ring around the canonical body center ----
big = big_pose_params()
verts_big, _ = smpl_forward(model, big["poses"], big["shapes"])
center = np.asarray(jnp.mean(verts_big, axis=0))

FOV = 1.0
focal = SIZE / (2.0 * np.tan(FOV / 2.0))
K = np.array([[focal, 0.0, SIZE / 2.0],
              [0.0, focal, SIZE / 2.0],
              [0.0, 0.0, 1.0]])

Ks, Ds, Rs, Ts = [], [], [], []
for v in range(N_VIEWS):
    theta = 2 * np.pi * v / N_VIEWS
    eye = center + 3.0 * np.array([np.sin(theta), 0.0, np.cos(theta)])
    # same construction as data/synthetic.look_at_camera, but emitted as
    # the w2c R + T(mm) the monocap annots store
    fwd = center - eye
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])
    if abs(np.dot(up, fwd)) > 0.98:
        up = np.array([0.0, 0.0, 1.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R_c2w = np.stack([right, down, fwd], axis=1)
    R_w2c = R_c2w.T
    t_w2c = -R_w2c @ eye
    Ks.append(K)
    Ds.append(np.zeros((5, 1)))
    Rs.append(R_w2c)
    Ts.append((t_w2c * 1000.0).reshape(3, 1))       # reader divides by 1000

np.save(os.path.join(ROOT, "annots.npy"),
        {"cams": {"K": Ks, "D": Ds, "R": Rs, "T": Ts}}, allow_pickle=True)

# ---- per-pose params + posed world vertices ----
all_poses = sorted(set(TRAIN_POSES + TEST_POSES))
os.makedirs(os.path.join(ROOT, "params"), exist_ok=True)
os.makedirs(os.path.join(ROOT, "vertices"), exist_ok=True)
fwd_jit = jax.jit(lambda p, s: smpl_forward(model, p, s)[0])
for pi in all_poses:
    rng = np.random.RandomState(1000 + pi)
    poses = (0.1 * rng.randn(72)).astype(np.float32)
    poses[:3] = 0.0                                   # root in Rh/Th
    shapes = np.zeros(10, np.float32)
    param = {
        "Rh": np.zeros((1, 3), np.float32),
        "Th": np.zeros((1, 3), np.float32),
        "shapes": shapes.reshape(1, 10),
        "poses": poses.reshape(1, 72),
    }
    np.save(os.path.join(ROOT, f"params/{pi}.npy"), param,
            allow_pickle=True)
    xyz = np.asarray(fwd_jit(jnp.asarray(poses), jnp.asarray(shapes)),
                     np.float32)
    np.save(os.path.join(ROOT, f"vertices/{pi}.npy"), xyz)
tick(f"params + vertices for {len(all_poses)} poses")

# ---- pass 1: placeholder images so the reader can build batches ----
import imageio.v2 as imageio

placeholder = np.zeros((SIZE, SIZE, 3), np.uint8)
mask_full = np.full((SIZE, SIZE), 255, np.uint8)
for v in range(N_VIEWS):
    os.makedirs(os.path.join(ROOT, f"images/{v:02d}"), exist_ok=True)
    os.makedirs(os.path.join(ROOT, f"mask/{v:02d}"), exist_ok=True)
    pis = TRAIN_POSES if v == 0 else TEST_POSES
    for pi in pis:
        imageio.imwrite(os.path.join(ROOT, f"images/{v:02d}/{pi:04d}.jpg"),
                        placeholder)
        imageio.imwrite(os.path.join(ROOT, f"mask/{v:02d}/{pi:04d}.png"),
                        mask_full)
tick("placeholder layout written")

from mygauhuman_tpu.data.readers import (
    camera_info_to_batch,
    read_monocap_info,
)

info = read_monocap_info(ROOT, True, "monocap_synth", True,
                         smpl_model=model)
tick(f"reader pass 1: {len(info.train_cameras)} train / "
     f"{len(info.test_cameras)} test cameras")

# ---- known optimum: GT Gaussian scene on the body ----
rngc = np.random.RandomState(0)
colors = rngc.rand(N_VERTS, 3).astype(np.float32)
normals = rngc.randn(N_VERTS, 3).astype(np.float32)
normals /= np.linalg.norm(normals, axis=1, keepdims=True)
gt_state = G.create_from_pcd(np.asarray(verts_big), colors, normals)
cap = gt_state.capacity
gt_state = gt_state._replace(
    params=gt_state.params._replace(
        opacity=jnp.full((cap, 1), float(inverse_sigmoid(0.9)))
    )
)

from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.render import render_frame

cfgR = RasterizerConfig(
    use_pallas=jax.devices()[0].platform not in ("cpu",))
model_arrays = {
    "v_template": model.v_template,
    "shapedirs": model.shapedirs,
    "posedirs": model.posedirs,
    "j_regressor": model.j_regressor,
    "weights": model.weights,
}


@jax.jit
def _gt_view(gt_state, model_arrays, cam, frame):
    out = render_frame(
        gt_state, cam, frame, model._replace(**model_arrays),
        bg=jnp.ones(3), active_sh_degree=0, config=cfgR,
    )
    return (jax.lax.stop_gradient(out.render),
            (out.render_alpha > 0.5).astype(jnp.float32))


def write_view(ci):
    batch = camera_info_to_batch(ci)
    img, msk = _gt_view(gt_state, model_arrays, batch.camera, batch.frame)
    img8 = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
    m8 = (np.asarray(msk) * 255).astype(np.uint8)
    v = int(ci.image_name)
    imageio.imwrite(
        os.path.join(ROOT, f"images/{v:02d}/{ci.pose_id:04d}.jpg"),
        img8, quality=95)
    imageio.imwrite(
        os.path.join(ROOT, f"mask/{v:02d}/{ci.pose_id:04d}.png"), m8)


for i, ci in enumerate(info.train_cameras):
    write_view(ci)
    if i % 25 == 0:
        tick(f"gt train view {i}/{len(info.train_cameras)}")
for i, ci in enumerate(info.test_cameras):
    write_view(ci)
    if i % 50 == 0:
        tick(f"gt test view {i}/{len(info.test_cameras)}")
tick("ground-truth images written — dataset ready")
print(f"DATASET {ROOT} pkl={PKL}")
