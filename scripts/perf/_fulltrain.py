"""VERDICT r1 #4: the complete ZJU-budget training run, measured end-to-end
(compile + densify + LPIPS + eval + checkpoint) through cli/train.py."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import time
t0 = time.time()
def tick(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

import mygauhuman_tpu.train.trainer as TR
_orig = TR.train_loop
def train_loop_traced(*a, **k):
    tick("entering train_loop (scene built, state ready)")
    cb = k.get("callback")
    def cb2(it, ts, m):
        if it in (1, 2, 10, 100, 400, 800, 1200):
            tick(f"iter {it} loss={float(m['loss']):.4f} alive={int(ts.gauss.num_alive)}")
        if cb: cb(it, ts, m)
    k["callback"] = cb2
    return _orig(*a, **k)
TR.train_loop = train_loop_traced
import mygauhuman_tpu.cli.train as CT
CT.train_loop = train_loop_traced

result = CT.main([
    "--synthetic", "--synthetic_size", "512",
    "--synthetic_verts", "6890",
    "--iterations", "1200",
    "--test_iterations", "600", "1200",
    "--save_iterations", "1200",
    "--model_path", "/tmp/full_synth",
    "--use_pallas",
])
print("RESULT:", result, flush=True)
print(f"TOTAL WALL (incl. scene build + compiles): {time.time()-t0:.1f}s", flush=True)
