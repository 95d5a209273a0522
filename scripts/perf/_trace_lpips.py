"""Op-level trace of the LPIPS fwd+bwd at the train-step shape (384^2, 2 pairs)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import collections
import glob
import gzip
import json

import jax
import jax.numpy as jnp

from mygauhuman_tpu.eval.lpips import LPIPS

lp = LPIPS()
a = jnp.zeros((2, 384, 384, 3), jnp.float32)
b = jnp.ones((2, 384, 384, 3), jnp.float32)


@jax.jit
def fwdbwd(x, y):
    return jax.value_and_grad(lambda q: jnp.sum(lp._fn.__wrapped__(q, y)))(x)

out = fwdbwd(a, b)
jax.block_until_ready(out)
jax.profiler.start_trace("/tmp/tr_lpips")
for _ in range(5):
    out = fwdbwd(a, b)
jax.block_until_ready(out)
jax.profiler.stop_trace()

f = sorted(glob.glob("/tmp/tr_lpips/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(f) as fh:
    tr = json.load(fh)
events = tr["traceEvents"]
pid_names = {e["pid"]: e["args"].get("name", "") for e in events
             if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e}
durs = collections.defaultdict(float)
cnt = collections.Counter()
long = {}
for e in events:
    if e.get("ph") == "X" and "dur" in e and "TPU" in pid_names.get(e["pid"], ""):
        durs[e["name"]] += e["dur"]
        cnt[e["name"]] += 1
        if e["name"] not in long:
            long[e["name"]] = e.get("args", {}).get("long_name", "")[:160]
total = sum(durs.values()) / 5000
print(f"total device: {total:.3f} ms")
for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{d/5000:8.3f} ms  x{cnt[name]//5:3d}  {name[:60]}")
    if long[name]:
        print(f"           {long[name]}")
