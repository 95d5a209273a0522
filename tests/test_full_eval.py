"""cli/full_eval smoke test: the batch train+render+aggregate driver
(the reference's `full_eval.py`) over a tiny on-disk MonoCap-format
fixture — real reader, real train loop, real render, one summary json.
"""
import json
import os
import pickle

import numpy as np

IMG = 32


def _write_img(path, value=0.5, channels=3):
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.full((IMG, IMG, channels) if channels > 1 else (IMG, IMG),
                  int(value * 255), np.uint8)
    imageio.imwrite(path, arr)


def _make_monocap_fixture(root, model):
    """Minimal MonoCap layout (annots + images/mask per view + params +
    vertices) — mirrors tests/test_data_readers.py::TestMonoCap."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    n_views = 11
    K = np.array([[30.0, 0, IMG / 2], [0, 30.0, IMG / 2], [0, 0, 1]])
    cams = {
        "K": [K] * n_views,
        "D": [np.zeros((5, 1))] * n_views,
        "R": [np.eye(3)] * n_views,
        "T": [np.array([0.0, 0.0, 3000.0])] * n_views,
    }
    np.save(os.path.join(root, "annots.npy"), {"cams": cams},
            allow_pickle=True)
    verts = rng.randn(model.v_template.shape[0], 3).astype(np.float32) * 0.3
    param = {
        "Rh": np.zeros((1, 3), np.float32),
        "Th": np.zeros((1, 3), np.float32),
        "shapes": np.zeros((1, 10), np.float32),
        "poses": np.zeros((1, 72), np.float32),
    }
    for v in range(n_views):
        _write_img(os.path.join(root, f"images/{v:02d}/0000.jpg"), 0.6)
        _write_img(os.path.join(root, f"mask/{v:02d}/0000.png"), 1.0,
                   channels=1)
    needed = sorted(set(list(range(0, 500, 5)) + list(range(0, 510, 30))))
    os.makedirs(os.path.join(root, "params"), exist_ok=True)
    os.makedirs(os.path.join(root, "vertices"), exist_ok=True)
    for i in needed:
        np.save(os.path.join(root, f"params/{i}.npy"), param,
                allow_pickle=True)
        np.save(os.path.join(root, f"vertices/{i}.npy"), verts)
        for v in range(n_views):
            for sub, ext in (("images", "jpg"), ("mask", "png")):
                src = os.path.join(root, f"{sub}/{v:02d}/0000.{ext}")
                dst = os.path.join(root, f"{sub}/{v:02d}/{i:04d}.{ext}")
                if not os.path.exists(dst):
                    os.link(src, dst)


def _dump_smpl_pkl(model, path):
    kintree = np.zeros((2, 24), np.int64)
    kintree[1] = np.arange(24)
    kintree[0] = np.asarray(model.parents)
    kintree[0, 0] = 2**32 - 1
    with open(path, "wb") as f:
        pickle.dump({
            "v_template": np.asarray(model.v_template),
            "shapedirs": np.asarray(model.shapedirs),
            "posedirs": np.asarray(model.posedirs).reshape(-1, 207),
            "J_regressor": np.asarray(model.j_regressor),
            "weights": np.asarray(model.weights),
            "kintree_table": kintree,
            "f": np.asarray(model.faces),
        }, f)


def test_full_eval_smoke(tmp_path, monkeypatch):
    """Train + render + aggregate one tiny MonoCap scene end-to-end; the
    summary json must carry the render metrics keyed by scene name."""
    from mygauhuman_tpu.cli.full_eval import main as full_eval_main
    from mygauhuman_tpu.models.smpl import synthetic_smpl

    model = synthetic_smpl(num_vertices=90)
    scene = str(tmp_path / "monocap_tiny")
    _make_monocap_fixture(scene, model)
    pkl = str(tmp_path / "SMPL_NEUTRAL.pkl")
    _dump_smpl_pkl(model, pkl)
    monkeypatch.chdir(tmp_path)

    out_root = str(tmp_path / "full_eval_out")
    results = full_eval_main([
        "--scenes", scene,
        "--output_root", out_root,
        "--iterations", "4",
        "--smpl_model_path", pkl,
    ])
    assert "monocap_tiny" in results
    m = results["monocap_tiny"]
    assert np.isfinite(m["psnr"]) and "fps" in m
    summary = json.load(open(os.path.join(out_root, "full_eval.json")))
    assert "monocap_tiny" in summary
