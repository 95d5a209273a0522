"""Round 4 (VERDICT r3 #3): the full A->B pipeline, measured end-to-end.

Phase A (1,200 iters, geometry+appearance) -> PBR phase B (500 iters:
occlusion bake, split-sum light + material optimization, chunked loop) ->
relit novel-HDR render through cli/render --relight. The published
reference configs never reach branch B (train.py hard-codes
pbr_iteration=30000 > every script budget) — these are capability numbers.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import time
import numpy as np

t0 = time.time()
def tick(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

import mygauhuman_tpu.train.pbr as PBR
_orig = PBR.train_loop_pbr
def loop_traced(*a, **k):
    tick("entering train_loop_pbr (phase A done)")
    cb = k.get("callback")
    def cb2(it, ts, pbr, m):
        if it % 100 == 0:
            tick(f"pbr iter {it} loss={float(m['loss']):.4f} "
                 f"psnr={float(m['psnr']):.2f} "
                 f"bake_oob={int(m['bake_out_of_budget'])}")
        if cb: cb(it, ts, pbr, m)
    k["callback"] = cb2
    return _orig(*a, **k)
PBR.train_loop_pbr = loop_traced
import mygauhuman_tpu.cli.train as CT
CT_train_loop_pbr = loop_traced

result = CT.main([
    "--synthetic", "--synthetic_size", "512",
    "--synthetic_verts", "6890",
    "--iterations", "1700", "--pbr_iteration", "1200",
    "--test_iterations", "1200", "1700",
    "--save_iterations", "1700",
    "--model_path", "/tmp/full_pbr",
    "--use_pallas", "--capacity", "65536",
])
tick(f"train done: {result}")

from mygauhuman_tpu.cli.render import main as render_main
env = "/tmp/full_pbr/envmap_1700.npy"
m = render_main([
    "--model_path", "/tmp/full_pbr", "--iteration", "1700",
    "--synthetic", "--synthetic_size", "512", "--relight", env,
])
tick(f"relight render: psnr={m['psnr']:.2f} fps={m['fps']:.1f}")
print("PBR_RESULT", {"train": result, "relight_psnr": m["psnr"]}, flush=True)
