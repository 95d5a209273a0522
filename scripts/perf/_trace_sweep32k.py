"""Op anatomy of the 32k-Gaussian render sweep (honest fori_loop harness)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import collections
import functools
import glob
import gzip
import json

import jax
import jax.numpy as jnp

from mygauhuman_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.render import render_frame

n_verts, cap = 32768, 65536
cfg = RasterizerConfig(tile_capacity=1024, chunk_tiles=64, use_pallas=True,
                       instance_capacity=4 * cap)
scene = make_synthetic_scene(n_views=4, width=512, height=512,
                             n_verts=n_verts, capacity=cap, raster_config=cfg)
state = scene.gt_state
model = scene.smpl_model
views = []
for b in scene.batches:
    full = render_frame(state, b.camera, b.frame, model, bg=jnp.zeros(3),
                        active_sh_degree=0, config=cfg)
    views.append((b.camera, b.frame, full.transforms, full.translation))
vstack = jax.tree.map(lambda *xs: jnp.stack(xs), *views)


@functools.partial(jax.jit, static_argnames=("n",))
def sweep(params, vstack, n):
    def body(i, c):
        cam, frame, tfs, tls = jax.tree.map(lambda x: x[i % 4], vstack)
        st = state._replace(params=params._replace(
            opacity=params.opacity + 1e-12 * i.astype(jnp.float32)))
        o = render_frame(st, cam, frame, model, bg=jnp.zeros(3),
                         active_sh_degree=0, config=cfg,
                         transforms=tfs, translation=tls)
        return c + o.render[0, 0, 0]
    return jax.lax.fori_loop(0, n, body, jnp.zeros(()))


N = 64
sweep(state.params, vstack, N).block_until_ready()
jax.profiler.start_trace("/tmp/tr_sw32k")
sweep(state.params, vstack, N).block_until_ready()
jax.profiler.stop_trace()
f = sorted(glob.glob("/tmp/tr_sw32k/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(f) as fh:
    tr = json.load(fh)
events = tr["traceEvents"]
pid_names = {e["pid"]: e["args"].get("name", "") for e in events
             if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e}
durs = collections.defaultdict(float)
cnt = collections.Counter()
long = {}
for e in events:
    if (e.get("ph") == "X" and "dur" in e and "TPU" in pid_names.get(e["pid"], "")
            and not e["name"].startswith("jit_") and not e["name"].isdigit()
            and not e["name"].startswith("while")):
        durs[e["name"]] += e["dur"]
        cnt[e["name"]] += 1
        if e["name"] not in long:
            long[e["name"]] = (e.get("args", {}).get("long_name", "") or "")[:110]
print(f"op-sum: {sum(durs.values())/(N*1000):.3f} ms/frame")
for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:16]:
    print(f"{d/(N*1000):7.3f} ms  x{cnt[name]//N:3d}  {name[:30]}  {long[name][:95]}")
