"""Measure LPIPS fwd+bwd variants at the train-step shape (384^2, 2 pairs)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import time

import jax
import jax.numpy as jnp

from mygauhuman_tpu.eval import lpips as L

params = L.init_lpips()
a = jnp.zeros((2, 384, 384, 3), jnp.float32)
b = jnp.ones((2, 384, 384, 3), jnp.float32)


def dist_split(params, img1, img2):
    f1 = L._features(params, img1)
    f2 = L._features(params, img2)
    total = 0.0
    for x, y, lin in zip(f1, f2, params.lins):
        x = x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-10)
        y = y * jax.lax.rsqrt(jnp.sum(y * y, axis=-1, keepdims=True) + 1e-10)
        d = (x - y) ** 2
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
    return total


def bench(fn, label):
    g = jax.jit(jax.value_and_grad(lambda q: jnp.sum(fn(params, q, b))))
    out = g(a)
    jax.block_until_ready(out)
    start = time.perf_counter()
    reps = 0
    while True:
        for _ in range(16):
            out = g(a)
            reps += 1
        jax.block_until_ready(out)
        if time.perf_counter() - start > 3.0:
            break
    dt = (time.perf_counter() - start) / reps * 1e3
    print(f"{label}: {dt:.2f} ms", flush=True)


bench(dist_split, "split trunk calls + reshape-max pool")
bench(L.lpips_distance, "batched trunk + reshape-max pool")


def feats_rw(params, x):
    x = x * 2.0 - 1.0
    x = ((x - L._SHIFT) / L._SCALE).astype(jnp.bfloat16)
    feats = []
    for i, (p, (_, pool)) in enumerate(zip(params.convs, L._VGG_PLAN)):
        if pool:
            x = jax.lax.reduce_window(
                x, x.dtype.type(-jnp.inf), jax.lax.max,
                (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        x = jax.nn.relu(L._conv(x, p))
        if i in L._STAGE_ENDS:
            feats.append(x.astype(jnp.float32))
    return feats


def dist_rw(params, img1, img2):
    f1 = feats_rw(params, img1)
    f2 = feats_rw(params, img2)
    total = 0.0
    for x, y, lin in zip(f1, f2, params.lins):
        x = x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-10)
        y = y * jax.lax.rsqrt(jnp.sum(y * y, axis=-1, keepdims=True) + 1e-10)
        d = (x - y) ** 2
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
    return total


bench(dist_rw, "ORIGINAL: split trunk + reduce_window pool")
