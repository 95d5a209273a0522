"""jax.profiler trace of the full replay render at 32k G; parse per-op times."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import glob, gzip, json, os, time
import jax, jax.numpy as jnp, numpy as np
from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.render import render_frame

W = H = 512
cfg = RasterizerConfig(tile_capacity=1024, chunk_tiles=64, use_pallas=True)
scene = make_synthetic_scene(n_views=4, width=W, height=H, n_verts=32768,
                             capacity=65536, raster_config=cfg)
state, model, b = scene.gt_state, scene.smpl_model, scene.batches[0]
full = render_frame(state, b.camera, b.frame, model, bg=jnp.zeros(3),
                    active_sh_degree=0, config=cfg)
tfs, tls = full.transforms, full.translation

@jax.jit
def render_one(params, camera, frame):
    st = state._replace(params=params)
    out = render_frame(st, camera, frame, model, bg=jnp.zeros(3),
                      active_sh_degree=0, config=cfg,
                      transforms=tfs, translation=tls)
    return out.render

out = jax.block_until_ready(render_one(state.params, b.camera, b.frame))
tdir = "/tmp/trace_scale"
os.system(f"rm -rf {tdir}")
with jax.profiler.trace(tdir):
    for _ in range(20):
        out = render_one(state.params, b.camera, b.frame)
    jax.block_until_ready(out)

# parse
paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
ev = []
for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    pid_names = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    tpu_pids = {pid for pid, n in pid_names.items() if "TPU" in n and "pjrt" not in n.lower()}
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids and "dur" in e:
            ev.append((e["name"], e["dur"]))
from collections import defaultdict
agg = defaultdict(float); cnt = defaultdict(int)
for name, dur in ev:
    agg[name] += dur; cnt[name] += 1
total = sum(agg.values())
print(f"total device us (20 frames): {total:.0f}  => {total/20/1000:.3f} ms/frame")
for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{dur/20:10.1f} us/frame x{cnt[name]//20:4d}  {name[:110]}")
