"""Round 4 (VERDICT #5): scene-load wall-clock, native C++ decode pipeline
vs sequential imageio — a full-scale ZJU-format synthetic scene on disk
(50 poses x 4 train views, 1024^2 jpg images + normals + png masks)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import os, shutil, time
import numpy as np
import imageio.v2 as imageio

root = "/tmp/zju_loadbench"
SIZE = 1024
N_POSES = 50
VIEWS = list(range(19))

if not os.path.exists(os.path.join(root, "annots.npy")):
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    rng = np.random.RandomState(0)
    K = np.array([[1000.0, 0, SIZE / 2], [0, 1000.0, SIZE / 2], [0, 0, 1]])
    cams = {"K": [], "D": [], "R": [], "T": []}
    for v in VIEWS:
        th = 2 * np.pi * v / len(VIEWS)
        Rm = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                       [-np.sin(th), 0, np.cos(th)]])
        cams["K"].append(K); cams["D"].append(np.zeros((5, 1)))
        cams["R"].append(Rm); cams["T"].append(np.array([[0.], [0.], [3000.]]))
    ims = [{"ims": [f"images/{v:02d}/{f:06d}.jpg" for v in VIEWS]}
           for f in range(N_POSES * 10)]
    np.save(os.path.join(root, "annots.npy"), {"cams": cams, "ims": ims},
            allow_pickle=True)
    # distinct real jpg/png content per (train view, pose)
    img = (rng.rand(SIZE, SIZE, 3) * 255).astype(np.uint8)
    for v in [0, 6, 12, 18]:
        for f in range(0, N_POSES * 10, 10):
            p = os.path.join(root, f"images/{v:02d}/{f:06d}.jpg")
            os.makedirs(os.path.dirname(p), exist_ok=True)
            imageio.imwrite(p, np.roll(img, f + v, axis=0), quality=90)
            pn = os.path.join(root, f"normal/{v:02d}/{f:06d}.jpg")
            os.makedirs(os.path.dirname(pn), exist_ok=True)
            imageio.imwrite(pn, img[::-1], quality=90)
            pm = os.path.join(root, f"mask/{v:02d}/{f:06d}.png")
            os.makedirs(os.path.dirname(pm), exist_ok=True)
            imageio.imwrite(pm, (img[..., 0] > 64).astype(np.uint8) * 255)
    os.makedirs(os.path.join(root, "smpl_vertices"), exist_ok=True)
    os.makedirs(os.path.join(root, "smpl_params"), exist_ok=True)
    verts = rng.randn(6890, 3).astype(np.float32) * 0.3
    for f in range(0, N_POSES * 10, 10):
        np.save(os.path.join(root, f"smpl_vertices/{f}.npy"), verts)
        np.save(os.path.join(root, f"smpl_params/{f}.npy"), {
            "Rh": np.zeros((1, 3), np.float32),
            "Th": np.zeros((1, 3), np.float32),
            "shapes": np.zeros((1, 10), np.float32),
            "poses": np.zeros((1, 72), np.float32)}, allow_pickle=True)
    print("fixture built", flush=True)

import jax
jax.config.update("jax_platforms", "cpu")
from mygauhuman_tpu.data import readers as R
from mygauhuman_tpu.models.smpl import synthetic_smpl

smpl = synthetic_smpl(num_vertices=6890)

def run(native: bool):
    os.environ["MYGAUHUMAN_NATIVE_LOADER"] = "1" if native else "0"
    t0 = time.perf_counter()
    infos = R.read_cameras_zju(root, [0, 6, 12, 18], False, smpl,
                               split="train")
    dt = time.perf_counter() - t0
    print(f"native={native}: {dt:.2f}s for {len(infos)} views "
          f"({len(infos)*3} files)", flush=True)
    return infos, dt

run(native=True)     # warm the page cache equally
i_nat, t_nat = run(native=True)
i_im, t_im = run(native=False)
np.testing.assert_allclose(i_nat[0].image, i_im[0].image, atol=1e-6)
np.testing.assert_allclose(i_nat[0].bkgd_mask, i_im[0].bkgd_mask)
print(f"parity OK; speedup {t_im / t_nat:.2f}x", flush=True)
