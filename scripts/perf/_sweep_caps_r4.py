"""Round 4: step-time vs capacity sweep (ladder design input).

Measures the full train step (render+loss+bwd+adam, +/-lpips) at several
Gaussian capacities on the real chip — the capacity-shaped costs (N*S
binning keys, instance gathers) are the ladder's target.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import time
import jax, jax.numpy as jnp
from mygauhuman_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
from mygauhuman_tpu.config import OptimizationConfig
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.eval.lpips import LPIPS
from mygauhuman_tpu.models.mlps import init_lbs_offset, init_pose_refiner
from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.train.trainer import create_train_state, make_train_step

lp = LPIPS()

def bench(step, ts, b, label):
    t0 = time.perf_counter()
    ts2, m = step(ts, b, 0)
    jax.block_until_ready(m["loss"])
    compile_s = time.perf_counter() - t0
    start = time.perf_counter(); reps = 0
    while True:
        for _ in range(32):
            ts2, m = step(ts2, b, 0); reps += 1
        jax.block_until_ready(m["loss"])
        if time.perf_counter() - start > 3.0: break
    dt = (time.perf_counter() - start) / reps * 1e3
    print(f"{label}: {dt:.2f} ms/step  (compile+load {compile_s:.1f}s)", flush=True)

for CAP in (8192, 16384, 32768, 65536):
    rc = RasterizerConfig(use_pallas=True, instance_capacity=4 * CAP)
    scene = make_synthetic_scene(n_views=1, width=512, height=512,
                                 n_verts=6890, capacity=CAP, raster_config=rc)
    cfg = OptimizationConfig()
    ts, tx = create_train_state(cfg, scene.init_state,
                                init_pose_refiner(jax.random.PRNGKey(0)),
                                init_lbs_offset(jax.random.PRNGKey(1)))
    b = scene.batches[0]
    bench(make_train_step(scene.smpl_model, tx, cfg, rc, bg=jnp.zeros(3)),
          ts, b, f"cap {CAP:6d} no-lpips")
    bench(make_train_step(scene.smpl_model, tx, cfg, rc, bg=jnp.zeros(3),
                          lpips_fn=lp),
          ts, b, f"cap {CAP:6d} +lpips ")
