import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import jax, jax.numpy as jnp
from mygauhuman_tpu.config import OptimizationConfig
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.train.trainer import create_train_state, make_train_step, train_loop
from mygauhuman_tpu.models.mlps import init_lbs_offset, init_pose_refiner

scene = make_synthetic_scene(n_views=3, width=64, height=64, n_verts=100,
                             capacity=256,
                             raster_config=RasterizerConfig(use_pallas=False))
cfg = OptimizationConfig(densify_from_iter=6, densify_until_iter=20,
                         densification_interval=5)

def run(chunk, donate):
    ts, tx = create_train_state(cfg, scene.init_state,
                                init_pose_refiner(jax.random.PRNGKey(0)),
                                init_lbs_offset(jax.random.PRNGKey(1)))
    step = make_train_step(scene.smpl_model, tx, cfg, scene.raster_config,
                           bg=jnp.zeros(3), donate=donate)
    seen = []
    ts, m = train_loop(ts, tx, step, scene.batches, cfg,
                       extent=scene.extent,
                       smpl_vertices=scene.big_pose_verts,
                       num_iterations=25, seed=3, scan_chunk=chunk,
                       callback_iters=(13,),
                       callback=lambda it, ts, m: seen.append(it))
    return float(m["loss"]), int(ts.gauss.num_alive), int(ts.step), seen

l1, a1, s1, seen1 = run(1, False)
l2, a2, s2, seen2 = run(8, True)
print("unchunked:", l1, a1, s1, seen1)
print("chunked:  ", l2, a2, s2, seen2)
assert s1 == s2 == 25
assert a1 == a2, (a1, a2)
assert abs(l1 - l2) < 1e-5, (l1, l2)
print("CHUNK PARITY OK")
