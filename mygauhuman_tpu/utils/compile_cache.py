"""Persistent XLA compilation cache.

The reference has no analogue (CUDA kernels AOT-compile at pip-install
time); under JAX every train-step signature JITs at first use, and in a
remote-compile environment (the axon tunnel) a big LPIPS-laden train step
costs 40-120 s per signature. Caching compiled executables on disk makes
every repeat run — and every capacity-growth re-jit that was seen before —
near-instant, which is most of the gap between the measured full-train wall
clock and its device-time floor (PERF.md "Measured end-to-end training").

Called by every CLI driver, `bench.py`, and `__graft_entry__`.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/mygauhuman_tpu/xla_cache")


def enable_persistent_cache(path: str | None = None) -> str:
    """Idempotently point JAX's compilation cache at a persistent dir.

    Override with MYGAUHUMAN_JAX_CACHE=<dir>; set it to "0"/"off" to
    disable (e.g. for cold-compile benchmarking).
    """
    import jax

    env = os.environ.get("MYGAUHUMAN_JAX_CACHE", "")
    if env.lower() in ("0", "off", "none"):
        return ""
    path = path or env or _DEFAULT
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Pallas kernels serialize their MLIR (incl. LOCATION metadata with
    # the full Python call stack) into the custom-call backend_config —
    # bytes the cache key hashes but the key canonicalizer cannot strip.
    # Any program containing a Pallas call therefore got a DIFFERENT key
    # per calling code path: cli/train --precompile warmed keys the real
    # train loop then missed entirely (measured: 283 s precompile + 274 s
    # "warm" run; byte-identical modules once tracebacks are excluded —
    # PERF.md round-5 cold-start section). Op-level profiling attribution
    # is unaffected (it rides the jaxpr name stack, not these locs).
    jax.config.update("jax_include_full_tracebacks_in_locations", False)
    # 0.1 s floor: with the 1.0 s default, every small eager/init program
    # sat below the threshold and recompiled through the tunnel on every
    # process start (hundreds of round trips during scene build)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    return path
