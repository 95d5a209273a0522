"""Tile-sharded step scaling SHAPE on the virtual CPU mesh (VERDICT r4
weak #2 / next #7): step-time RATIO across 1/2/4/8 raster shards, same
total work. Absolute times are meaningless on host-thread 'devices'; the
ratio shows whether the per-shard exchange windows (K-capped sort-based
compaction, merge fan-in) actually shrink with shard count — the 1-shard
case is the degenerate worst case (262k-lane windows at full scale).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python scripts/perf/_shard_scaling.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))
_os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import time

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from mygauhuman_tpu.config import OptimizationConfig
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.models.mlps import init_lbs_offset, init_pose_refiner
from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.parallel.train import (
    make_tile_sharded_train_step,
    stack_batches,
)
from mygauhuman_tpu.train.trainer import create_train_state

from jax.sharding import Mesh

rc = RasterizerConfig(tile_capacity=256, max_tiles_per_gaussian=8,
                      use_pallas=True, pallas_interpret=True)
scene = make_synthetic_scene(n_views=2, width=128, height=128, n_verts=2048,
                             capacity=4096, raster_config=rc)
cfg = OptimizationConfig()
ts, tx = create_train_state(
    cfg, scene.init_state,
    init_pose_refiner(jax.random.PRNGKey(0)),
    init_lbs_offset(jax.random.PRNGKey(1)),
)
batch = stack_batches(scene.batches[:1])

rows = []
for shards in (1, 2, 4, 8):
    g = 1 if shards == 1 else 2
    t = shards // g
    mesh = Mesh(np.asarray(jax.devices()[:shards]).reshape(1, g, t),
                ("data", "gauss", "tiles"))
    step = make_tile_sharded_train_step(
        scene.smpl_model, tx, cfg, rc, bg=jnp.zeros(3), mesh=mesh,
        exchange_capacity=4096,
    )
    ts2, m = step(ts, batch, 0)       # compile + first run
    jax.block_until_ready(m["loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            ts2, m = step(ts2, batch, 0)
        jax.block_until_ready(m["loss"])
        best = min(best, (time.perf_counter() - t0) / 5)
    rows.append((shards, best * 1e3, float(m["loss"])))
    print(f"shards={shards}  {best*1e3:8.1f} ms/step  loss={rows[-1][2]:.4f}",
          flush=True)

base = rows[0][1]
print("\nratio vs 1 shard (lower = the per-shard exchange really shrinks):")
for shards, ms, _ in rows:
    print(f"  {shards} shards: {ms/base:.2f}x")
