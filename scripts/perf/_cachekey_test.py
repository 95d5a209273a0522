import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import sys, jax, jax.numpy as jnp
from mygauhuman_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache("/tmp/cachekey_test")
import time
from mygauhuman_tpu.config import OptimizationConfig
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.train.trainer import create_train_state, make_train_step
from mygauhuman_tpu.models.mlps import init_lbs_offset, init_pose_refiner

scene = make_synthetic_scene(n_views=2, width=64, height=64, n_verts=100,
                             capacity=256,
                             raster_config=RasterizerConfig(use_pallas=True))
cfg = OptimizationConfig()
ts, tx = create_train_state(cfg, scene.init_state,
                            init_pose_refiner(jax.random.PRNGKey(0)),
                            init_lbs_offset(jax.random.PRNGKey(1)))
step = make_train_step(scene.smpl_model, tx, cfg, scene.raster_config,
                       bg=jnp.zeros(3), donate=False)
t0 = time.time()
ts2, m = step(ts, scene.batches[0], 0)
jax.block_until_ready(m["loss"])
print(f"step compile+run: {time.time()-t0:.1f}s")
