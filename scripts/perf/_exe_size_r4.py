"""Round 4: executable size + load/compile + step time after de-constanting."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))
_os.environ["MYGAUHUMAN_JAX_CACHE"] = "/tmp/xla_cache_r4"

import time
import jax, jax.numpy as jnp
from mygauhuman_tpu.utils.compile_cache import enable_persistent_cache
print("cache:", enable_persistent_cache())
from mygauhuman_tpu.config import OptimizationConfig
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.eval.lpips import LPIPS
from mygauhuman_tpu.models.mlps import init_lbs_offset, init_pose_refiner
from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.train.trainer import create_train_state, make_train_step

CAP = 65536
rc = RasterizerConfig(use_pallas=True, instance_capacity=4 * CAP)
scene = make_synthetic_scene(n_views=1, width=512, height=512, n_verts=6890,
                             capacity=CAP, raster_config=rc)
cfg = OptimizationConfig()
ts, tx = create_train_state(cfg, scene.init_state,
                            init_pose_refiner(jax.random.PRNGKey(0)),
                            init_lbs_offset(jax.random.PRNGKey(1)))
b = scene.batches[0]

def bench(step, label):
    t0 = time.perf_counter()
    ts2, m = step(ts, b, 0)
    jax.block_until_ready(m["loss"])
    comp = time.perf_counter() - t0
    start = time.perf_counter(); reps = 0
    while True:
        for _ in range(32):
            ts2, m = step(ts2, b, 0); reps += 1
        jax.block_until_ready(m["loss"])
        if time.perf_counter() - start > 3.0: break
    dt = (time.perf_counter() - start) / reps * 1e3
    print(f"{label}: {dt:.2f} ms/step (compile {comp:.1f}s)", flush=True)

bench(make_train_step(scene.smpl_model, tx, cfg, rc, bg=jnp.zeros(3)),
      "cap 65536 no-lpips")
bench(make_train_step(scene.smpl_model, tx, cfg, rc, bg=jnp.zeros(3),
                      lpips_fn=LPIPS()),
      "cap 65536 +lpips ")
import subprocess
print(subprocess.run(["ls", "-laS", "/tmp/xla_cache_r4"],
                     capture_output=True, text=True).stdout)
