"""Op-level trace of the full +lpips train step at 64k capacity."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import collections
import glob
import gzip
import json

import jax
import jax.numpy as jnp

from mygauhuman_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
from mygauhuman_tpu.config import OptimizationConfig
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.eval.lpips import LPIPS
from mygauhuman_tpu.models.mlps import init_lbs_offset, init_pose_refiner
from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.train.trainer import create_train_state, make_train_step

CAP = 65536
rc = RasterizerConfig(use_pallas=True, instance_capacity=4 * CAP)
scene = make_synthetic_scene(n_views=4, width=512, height=512, n_verts=6890,
                             capacity=CAP, raster_config=rc)
cfg = OptimizationConfig()
ts, tx = create_train_state(cfg, scene.init_state,
                            init_pose_refiner(jax.random.PRNGKey(0)),
                            init_lbs_offset(jax.random.PRNGKey(1)))
b = scene.batches[0]
step = make_train_step(scene.smpl_model, tx, cfg, rc, bg=jnp.zeros(3),
                       lpips_fn=LPIPS())
ts2, m = step(ts, b, 0)
jax.block_until_ready(m["loss"])

N_REPS = 5
jax.profiler.start_trace("/tmp/tr_step64k")
for _ in range(N_REPS):
    ts2, m = step(ts2, b, 0)
jax.block_until_ready(m["loss"])
jax.profiler.stop_trace()

f = sorted(glob.glob("/tmp/tr_step64k/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(f) as fh:
    tr = json.load(fh)
events = tr["traceEvents"]
pid_names = {e["pid"]: e["args"].get("name", "") for e in events
             if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e}

durs = collections.defaultdict(float)
cnt = collections.Counter()
long = {}
for e in events:
    if (e.get("ph") == "X" and "dur" in e
            and "TPU" in pid_names.get(e["pid"], "")
            and not e["name"].startswith("jit_")
            and not e["name"].isdigit()):
        durs[e["name"]] += e["dur"]
        cnt[e["name"]] += 1
        if e["name"] not in long:
            a = e.get("args", {})
            long[e["name"]] = (a.get("long_name", "") or "")[:200]
total = sum(durs.values()) / (N_REPS * 1000)
print(f"sum of op time: {total:.3f} ms/step over {len(durs)} op names")
for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{d/(N_REPS*1000):8.3f} ms  x{cnt[name]//N_REPS:4d}  {name[:55]}")
    if long[name]:
        print(f"           {long[name][:190]}")
