"""Micro-bench: instance-gather variants at 64k capacity.

The current [D, NS] column gather lowers to a row gather into [NS, 32]{1,0}
(physically lane-padded 32 -> 128, 4x HBM) plus a relayout copy. Candidate:
a blocked [NB, D, 128] gather (vmapped lane-gather, 128 instances per block
in lanes) that needs no relayout and no pad.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))
import functools
import time

import jax
import jax.numpy as jnp

from mygauhuman_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

N, D, I = 65536, 32, 262144
table0 = jax.random.normal(jax.random.PRNGKey(0), (D, N), jnp.float32)
idx0 = jax.random.randint(jax.random.PRNGKey(1), (I,), 0, N, jnp.int32)
REPS = 64


def harness(body):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(table, idx, n):
        def step(i, c):
            out = body(table + 1e-12 * i, idx)
            return c + out.reshape(-1)[0] + out.reshape(-1)[-1]
        return jax.lax.fori_loop(0, n, step, jnp.zeros(()))
    run(table0, idx0, 4).block_until_ready()
    t0 = time.perf_counter()
    run(table0, idx0, REPS).block_until_ready()
    return (time.perf_counter() - t0) / REPS * 1e3


def col_gather(table, idx):
    return table.at[:, idx].get(mode="promise_in_bounds")      # [D, I]


def blocked_gather(table, idx):
    blocks = idx.reshape(-1, 128)                               # [NB, 128]
    return jax.vmap(
        lambda ix: table.at[:, ix].get(mode="promise_in_bounds")
    )(blocks)                                                   # [NB, D, 128]


def row_gather(table, idx):
    return table.T.at[idx].get(mode="promise_in_bounds")        # [I, D]


for name, f in [
    ("col [D,I] (current)", col_gather),
    ("blocked [NB,D,128]", blocked_gather),
    ("row [I,D] (no copy)", row_gather),
]:
    print(f"{name:22s} {harness(f):7.3f} ms")
