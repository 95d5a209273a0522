"""Raw costs: big sort vs scatter-compaction alternatives at 32k/cap64k."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import time, jax, jax.numpy as jnp, numpy as np

def bench(fn, args, label):
    out = jax.block_until_ready(fn(*args))
    start = time.perf_counter(); reps = 0
    while True:
        for _ in range(64):
            out = fn(*args); reps += 1
        jax.block_until_ready(out)
        if time.perf_counter() - start > 2.0: break
    dt = (time.perf_counter() - start) / reps * 1e3
    print(f"{label}: {dt:.3f} ms", flush=True)
    return dt

N, S = 65536, 16
NS = N * S
I = 256 * 1024      # compact instance capacity
rng = np.random.RandomState(0)
key_np = rng.randint(0, 2**30, NS).astype(np.int32)
gid_np = np.tile(np.arange(N, dtype=np.int32)[:, None], (1, S)).reshape(-1)
keys = jnp.asarray(key_np); gids = jnp.asarray(gid_np)

@jax.jit
def sort_pair_1M(k, g):
    return jax.lax.sort((k, g), num_keys=1)
bench(sort_pair_1M, (keys, gids), "sort (i32 key + i32 val) 1M")

keys_s = keys[:I]; gids_s = gids[:I]
@jax.jit
def sort_pair_256k(k, g):
    return jax.lax.sort((k, g), num_keys=1)
bench(sort_pair_256k, (keys_s, gids_s), "sort (i32 key + i32 val) 256k")

# scatter compaction: NS slots -> I buffer at precomputed unique dests
live = (key_np % 5 < 2)   # ~40% "real" slots, like 168k/1M
dest_np = np.where(live, np.minimum(np.cumsum(live) - 1, I), I).astype(np.int32)
dests = jnp.asarray(dest_np)
@jax.jit
def scatter_compact(k, g, d):
    kb = jnp.full((I + 1,), 2**30, jnp.int32).at[d].set(k, mode="drop")
    gb = jnp.zeros((I + 1,), jnp.int32).at[d].set(g, mode="drop")
    return kb, gb
bench(scatter_compact, (keys, gids, dests), "scatter-compact 1M->256k (2 arrays)")

# gather [D, NS] vs [D, I]
D = 32
attrs = jnp.asarray(rng.rand(D, N).astype(np.float32))
idx1M = jnp.asarray(rng.randint(0, N, NS).astype(np.int32))
idx256 = idx1M[:I]
@jax.jit
def gather_big(a, i): return jnp.take(a, i, axis=1)
bench(gather_big, (attrs, idx1M), "gather [32, 1M]")
@jax.jit
def gather_small(a, i): return jnp.take(a, i, axis=1)
bench(gather_small, (attrs, idx256), "gather [32, 256k]")

# cumsum over [N] (for offsets)
t_np = rng.randint(0, 5, N).astype(np.int32)
t = jnp.asarray(t_np)
@jax.jit
def cumsum_n(x): return jnp.cumsum(x)
bench(cumsum_n, (t,), "cumsum [64k]")

# one-key sort where val rides in the key? i64 sort compare
k64 = keys.astype(jnp.int64) * NS + jnp.arange(NS, dtype=jnp.int64)
@jax.jit
def sort_i64(k): return jax.lax.sort(k)
bench(sort_i64, (k64,), "sort i64 1M (packed)")
