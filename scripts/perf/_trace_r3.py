"""Round-3 trace of the bench.py workload (fori_loop harness, one dispatch).

Aggregates TPU op durations over F in-loop frames; prints per-frame cost by
op, descending. Usage: python scripts/perf/_trace_r3.py [n_verts] [capacity]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import functools, glob, gzip, json, os, sys, time
import jax, jax.numpy as jnp

from mygauhuman_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.render import render_frame

N_VERTS = int(sys.argv[1]) if len(sys.argv) > 1 else 6890
CAPACITY = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
V = 4
F = 64

cfg = RasterizerConfig(tile_capacity=1024, chunk_tiles=64, use_pallas=True,
                       instance_capacity=4 * CAPACITY)
scene = make_synthetic_scene(n_views=V, width=512, height=512,
                             n_verts=N_VERTS, capacity=CAPACITY,
                             raster_config=cfg)
state, model = scene.gt_state, scene.smpl_model

views = []
for b in scene.batches:
    full = render_frame(state, b.camera, b.frame, model, bg=jnp.zeros(3),
                        active_sh_degree=0, config=cfg)
    views.append((b.camera, b.frame, full.transforms, full.translation))
vstack = jax.device_put(jax.tree.map(lambda *xs: jnp.stack(xs), *views))
params = jax.device_put(state.params)


@functools.partial(jax.jit, static_argnames=("n_frames",))
def render_sweep(params, vstack, n_frames):
    def body(i, carry):
        cam, frame, tfs, tls = jax.tree.map(lambda x: x[i % V], vstack)
        eps = 1e-12 * i.astype(jnp.float32)
        st = state._replace(params=params._replace(
            opacity=params.opacity + eps))
        out = render_frame(st, cam, frame, model, bg=jnp.zeros(3),
                           active_sh_degree=0, config=cfg,
                           transforms=tfs, translation=tls)
        return carry + out.render[0, 0, 0]
    return jax.lax.fori_loop(0, n_frames, body, jnp.zeros(()))


render_sweep(params, vstack, F).block_until_ready()
start = time.perf_counter()
render_sweep(params, vstack, F).block_until_ready()
wall = time.perf_counter() - start
print(f"wall: {wall*1e3:.2f} ms for {F} frames -> {wall/F*1e3:.3f} ms/frame, "
      f"{F/wall:.0f} FPS")

tdir = "/tmp/trace_r3"
os.system(f"rm -rf {tdir}")
with jax.profiler.trace(tdir):
    render_sweep(params, vstack, F).block_until_ready()

paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
tot = {}
long = {}
for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    pid_names = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    tpu_pids = {pid for pid, n in pid_names.items()
                if "TPU" in n and "pjrt" not in n.lower()}
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids and "dur" in e:
            n = e["name"]
            tot[n] = tot.get(n, 0.0) + e["dur"]
            if n not in long:
                a = e.get("args", {})
                long[n] = a.get("long_name", "")[:140]

items = sorted(tot.items(), key=lambda kv: -kv[1])
total = sum(tot.values())
print(f"total device time: {total/1e3:.2f} ms  ({total/1e3/F:.3f} ms/frame)")
for n, d in items[:25]:
    print(f"{d/F:9.1f} us/frame  {n:40s} {long.get(n,'')[:100]}")
