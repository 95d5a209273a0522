"""LPIPS micro-bench: fwd and fwd+bwd at the training crop size."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import time
import jax, jax.numpy as jnp
from mygauhuman_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
from mygauhuman_tpu.eval.lpips import LPIPS, init_lpips, lpips_distance

params = init_lpips()
key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (2, 384, 384, 3))
y = jax.random.uniform(jax.random.PRNGKey(1), (2, 384, 384, 3))

fwd = jax.jit(lambda a, b: lpips_distance(params, a, b).sum())
grad = jax.jit(jax.grad(lambda a, b: lpips_distance(params, a, b).sum()))

def bench(f, label):
    o = f(x, y); jax.block_until_ready(o)
    t0 = time.perf_counter(); reps = 0
    while True:
        for _ in range(32): o = f(x, y); reps += 1
        jax.block_until_ready(o)
        if time.perf_counter() - t0 > 3: break
    print(f"{label}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms", flush=True)

bench(fwd, "lpips fwd  [2,384,384,3] pairs")
bench(grad, "lpips fwd+bwd")
