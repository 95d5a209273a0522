"""Micro-bench: 1M-key sort variants for binning (32k alive / 64k cap regime).

Uses the honest fori_loop harness (per-iteration unique inputs) — the axon
tunnel memoizes identical dispatches.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))
import functools
import time

import jax
import jax.numpy as jnp

from mygauhuman_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

N, S = 65536, 16
NS = N * S
I = 4 * N
key0 = jax.random.randint(jax.random.PRNGKey(0), (NS,), 0, 2**26, jnp.int32)
gid0 = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, S)).reshape(-1)
order0 = jax.random.permutation(jax.random.PRNGKey(1), jnp.arange(N, dtype=jnp.int32))
REPS = 64


def harness(body):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(key, gid, order, n):
        def step(i, c):
            out = body(key ^ i, gid, order)
            return c + out[0][0] + out[-1][-1]
        return jax.lax.fori_loop(0, n, step, jnp.zeros((), jnp.int32))
    run(key0, gid0, order0, 4).block_until_ready()
    t0 = time.perf_counter()
    run(key0, gid0, order0, REPS).block_until_ready()
    return (time.perf_counter() - t0) / REPS * 1e3


def pair_sort(key, gid, order):
    k, g = jax.lax.sort((key, gid), num_keys=1, is_stable=False)
    return k[:I], g[:I]


def single_sort_gather(key, gid, order):
    k = jax.lax.sort(key, is_stable=False)[:I]
    radix = 65536
    g = order.at[k % radix].get(mode="promise_in_bounds")
    return k, g


def single_sort_only(key, gid, order):
    k = jax.lax.sort(key, is_stable=False)
    return (k[:I],)


def tiered_pair(key, gid, order):
    k1 = key.reshape(N, S)[:, :4].reshape(-1)
    g1 = gid.reshape(N, S)[:, :4].reshape(-1)
    k2 = key.reshape(N, S)[:8192, 4:].reshape(-1)
    g2 = gid.reshape(N, S)[:8192, 4:].reshape(-1)
    k = jnp.concatenate([k1, k2])
    g = jnp.concatenate([g1, g2])
    ks, gs = jax.lax.sort((k, g), num_keys=1, is_stable=False)
    return ks[:I], gs[:I]


def tiered_single_gather(key, gid, order):
    k1 = key.reshape(N, S)[:, :4].reshape(-1)
    k2 = key.reshape(N, S)[:8192, 4:].reshape(-1)
    k = jnp.concatenate([k1, k2])
    ks = jax.lax.sort(k, is_stable=False)[:I]
    g = order.at[ks % 65536].get(mode="promise_in_bounds")
    return ks, g


for name, f in [
    ("pair_sort (current)", pair_sort),
    ("single+gather", single_sort_gather),
    ("single only", single_sort_only),
    ("tiered 360k pair", tiered_pair),
    ("tiered 360k single+gat", tiered_single_gather),
]:
    print(f"{name:24s} {harness(f):7.3f} ms")
