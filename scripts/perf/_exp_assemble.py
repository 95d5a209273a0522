"""Micro-bench: [T, c, P] tile-major -> [H, W, c] assemble variants on TPU."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))
import functools, time
import jax, jax.numpy as jnp

th = tw = 32
tile_h = tile_w = 16
C = 19
T = th * tw
P = tile_h * tile_w
H = W = 512
x = jax.device_put(jnp.arange(T * C * P, dtype=jnp.float32).reshape(T, C, P))

def v_current(x):
    y = x.reshape(th, tw, C, tile_h, tile_w)
    y = y.transpose(0, 3, 1, 4, 2).reshape(th * tile_h, tw * tile_w, C)
    return y

def v_planar(x):
    y = x.reshape(th, tw, C, tile_h, tile_w)
    y = y.transpose(2, 0, 3, 1, 4).reshape(C, th * tile_h, tw * tile_w)
    return y.transpose(1, 2, 0)

def v_planar_stop(x):
    y = x.reshape(th, tw, C, tile_h, tile_w)
    return y.transpose(2, 0, 3, 1, 4).reshape(C, th * tile_h, tw * tile_w)

def bench(f, x, n=200):
    g = jax.jit(lambda x: jax.lax.fori_loop(
        0, n, lambda i, c: c + f(x + 1e-12 * i.astype(jnp.float32)).sum(),
        jnp.zeros(())))
    g(x).block_until_ready()
    t0 = time.perf_counter()
    g(x).block_until_ready()
    dt = time.perf_counter() - t0
    return dt / n * 1e6

for name, f in [("current [H,W,C]", v_current),
                ("planar->HWC", v_planar),
                ("planar [C,H,W]", v_planar_stop)]:
    print(f"{name:20s} {bench(f, x):8.1f} us")
# check correctness
a = v_current(x)
b = v_planar(x)
print("allclose:", jnp.allclose(a, b))
