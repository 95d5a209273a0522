import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import jax, jax.numpy as jnp, numpy as np, glob, gzip, json, collections
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.render import render_frame

cfg_r = RasterizerConfig(use_pallas=True)
scene = make_synthetic_scene(n_views=1, width=512, height=512, n_verts=2048, capacity=8192, raster_config=cfg_r)
state, model, b = scene.gt_state, scene.smpl_model, scene.batches[0]
rf = jax.jit(lambda: render_frame(state, b.camera, b.frame, model, bg=jnp.zeros(3), active_sh_degree=0, config=cfg_r).render)
rf().block_until_ready()
jax.profiler.start_trace("/tmp/tr3")
for _ in range(5): rf().block_until_ready()
jax.profiler.stop_trace()
f = sorted(glob.glob("/tmp/tr3/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(f) as fh: tr = json.load(fh)
events = tr["traceEvents"]
pid_names = {e["pid"]: e["args"].get("name","") for e in events if e.get("ph")=="M" and e.get("name")=="process_name" and "args" in e}
durs = collections.defaultdict(float); cnt = collections.Counter()
for e in events:
    if e.get("ph") == "X" and "dur" in e and "TPU" in pid_names.get(e["pid"], ""):
        durs[e["name"]] += e["dur"]; cnt[e["name"]] += 1
for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:20]:
    print(f"{d/5000:8.3f} ms  x{cnt[name]//5}  {name[:70]}", flush=True)
