"""The reference's SECOND published budget, measured end-to-end (VERDICT
r4 next #10): MonoCap config (/root/reference/train_monocap.sh — 2,000
iterations, monocular train view, white background) on the full-scale
renderable MonoCap-format disk scene from _make_monocap_disk.py.

Run _make_monocap_disk.py first (or let this script do it if the dataset
is absent).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import os
import subprocess
import sys
import time

ROOT = "/tmp/monocap_disk/lan_synth"
OUT = "/tmp/monocap_disk/exp"

if not os.path.exists(os.path.join(ROOT, "annots.npy")):
    subprocess.run([sys.executable, os.path.join(
        os.path.dirname(__file__), "_make_monocap_disk.py"), ROOT],
        check=True)

t0 = time.time()


def tick(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)


import mygauhuman_tpu.train.trainer as TR

_orig = TR.train_loop


def train_loop_traced(*a, **k):
    tick("entering train_loop (scene built, state ready)")
    cb = k.get("callback")

    def cb2(it, ts, m):
        if it == 1 or it % 200 == 0:
            tick(f"iter {it} loss={float(m['loss']):.4f} "
                 f"alive={int(ts.gauss.num_alive)}")
        if cb:
            cb(it, ts, m)

    k["callback"] = cb2
    return _orig(*a, **k)


TR.train_loop = train_loop_traced
import mygauhuman_tpu.cli.train as CT

CT.train_loop = train_loop_traced

result = CT.main([
    "-s", ROOT,
    "--smpl_model_path", os.path.join(ROOT, "SMPL_NEUTRAL.pkl"),
    "--white_background",
    "--iterations", "2000",
    "--test_iterations", "1000", "2000",
    "--save_iterations", "2000",
    "--model_path", OUT,
    "--use_pallas", "--capacity", "65536",
    "--skip_galleries",
])
print("MONOCAP_RESULT:", result, flush=True)
print(f"TOTAL WALL (incl. dataset load + compiles): "
      f"{time.time()-t0:.1f}s", flush=True)
