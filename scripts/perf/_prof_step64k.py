"""Train-step anatomy at 64k capacity (the full-train steady-state regime).

Measures: full step +lpips, full step -lpips, lpips fwd+bwd alone,
render fwd alone, binning alone — on the real TPU.
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

CAP = 65536
N = 43000   # typical end-of-train alive count
rc = RasterizerConfig(use_pallas=True, instance_capacity=8 * CAP)
scene = make_synthetic_scene(n_views=4, width=512, height=512, n_verts=6890,
                             capacity=CAP, raster_config=rc)
cfg = OptimizationConfig()
ts, tx = create_train_state(cfg, scene.init_state,
                            init_pose_refiner(jax.random.PRNGKey(0)),
                            init_lbs_offset(jax.random.PRNGKey(1)))
b = scene.batches[0]


def bench(fn, args, label, n=32):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter(); reps = 0
    while True:
        for _ in range(n):
            out = fn(*args); reps += 1
        jax.block_until_ready(out)
        if time.perf_counter() - start > 3.0:
            break
    dt = (time.perf_counter() - start) / reps * 1e3
    print(f"{label}: {dt:.2f} ms", flush=True)
    return dt


def bench_step(step, label):
    ts2, m = step(ts, b, 0)
    jax.block_until_ready(m["loss"])
    start = time.perf_counter(); reps = 0
    while True:
        for _ in range(32):
            ts2, m = step(ts2, b, 0); reps += 1
        jax.block_until_ready(m["loss"])
        if time.perf_counter() - start > 3.0:
            break
    dt = (time.perf_counter() - start) / reps * 1e3
    print(f"{label}: {dt:.2f} ms/step", flush=True)


lp = LPIPS()
bench_step(make_train_step(scene.smpl_model, tx, cfg, rc, bg=jnp.zeros(3),
                           lpips_fn=lp), "step +lpips, cap 64k")
bench_step(make_train_step(scene.smpl_model, tx, cfg, rc, bg=jnp.zeros(3)),
           "step -lpips, cap 64k")

# lpips fwd+bwd alone at the bbox-crop size the step uses
img = jnp.zeros((256, 256, 3), jnp.float32)
gt = jnp.ones((256, 256, 3), jnp.float32)


@jax.jit
def lp_fwdbwd(a, c):
    return jax.value_and_grad(lambda x: lp(x, c))(a)

bench(lp_fwdbwd, (img, gt), "lpips fwd+bwd 256^2 crop")

# forward render alone at this capacity
from mygauhuman_tpu.render import render_frame


@jax.jit
def fwd(params):
    st = scene.gt_state._replace(params=params)
    return render_frame(st, b.camera, b.frame, scene.smpl_model,
                        bg=jnp.zeros(3), active_sh_degree=0,
                        config=rc).render

bench(fwd, (scene.gt_state.params,), "forward render (full deform path)")
