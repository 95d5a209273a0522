import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from mygauhuman_tpu.config import OptimizationConfig
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.models.mlps import init_lbs_offset, init_pose_refiner
from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.train.trainer import create_train_state, make_train_step, train_loop

rc = RasterizerConfig()
scene = make_synthetic_scene(n_views=4, width=96, height=96, n_verts=400,
                             capacity=512, raster_config=rc)
cfg = OptimizationConfig(iterations=520, densify_grad_threshold=5e-5)
ts, tx = create_train_state(cfg, scene.init_state,
                            init_pose_refiner(jax.random.PRNGKey(0)),
                            init_lbs_offset(jax.random.PRNGKey(1)))
step = make_train_step(scene.smpl_model, tx, cfg, rc, bg=jnp.zeros(3))

def cb(it, ts, m):
    if it % 50 == 0 or "capacity" in m:
        print(it, round(float(m["loss"]), 4), int(ts.gauss.num_alive),
              "cap", ts.gauss.capacity, flush=True)
    assert np.isfinite(float(m["loss"])), f"NaN at {it}"

ts, m = train_loop(ts, tx, step, scene.batches, cfg, extent=scene.extent,
                   smpl_vertices=scene.big_pose_verts, max_sh_degree=3,
                   seed=0, callback=cb, num_iterations=520)
print("final: loss", float(m["loss"]), "alive", int(ts.gauss.num_alive),
      "cap", ts.gauss.capacity)
for name, v in ts.gauss.params._asdict().items():
    assert np.isfinite(np.asarray(v)[np.asarray(ts.gauss.alive)]).all(), name
print("GROWTH REPRO: all finite", flush=True)
