import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import numpy as np, jax, jax.numpy as jnp, pickle
from mygauhuman_tpu.config import OptimizationConfig
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.models.mlps import init_lbs_offset, init_pose_refiner
from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.train.trainer import create_train_state, make_train_step, train_loop, active_sh_degree_at

cfg_r = RasterizerConfig(use_pallas=True)
scene = make_synthetic_scene(n_views=4, width=512, height=512, n_verts=400, capacity=1024, raster_config=cfg_r)
cfg = OptimizationConfig(iterations=1200)
k = jax.random.PRNGKey(0)
ts, tx = create_train_state(cfg, scene.init_state, init_pose_refiner(k), init_lbs_offset(jax.random.PRNGKey(1)))
step_fn = make_train_step(scene.smpl_model, tx, cfg, cfg_r, bg=jnp.zeros(3))

prev_ts = ts
prev_batch_idx = None
import numpy as np
host_rng = np.random.RandomState(0)
key = jax.random.PRNGKey(0)
from mygauhuman_tpu.models import gaussians as G
from mygauhuman_tpu.train.trainer import densify_event
from mygauhuman_tpu.train.optim import reset_opacity_moments
stack = []
for it in range(1, 1201):
    if not stack:
        stack = list(range(len(scene.batches)))
    bi = stack.pop(host_rng.randint(len(stack)))
    batch = scene.batches[bi]
    deg = active_sh_degree_at(it, 3)
    prev = ts
    ts, m = step_fn(ts, batch, deg)
    bad = not bool(jnp.all(jnp.isfinite(ts.gauss.params.xyz))
                   & jnp.all(jnp.isfinite(m["loss"])))
    if bad:
        print(f"FIRST NON-FINITE PARAM/LOSS after iter {it} (batch {bi}, deg {deg})", flush=True)
        with open("/tmp/nan_state.pkl", "wb") as f:
            pickle.dump({"ts": jax.device_get(prev), "bi": bi, "deg": deg, "it": it}, f)
        break
    if cfg.densify_from_iter <= it < cfg.densify_until_iter and it % cfg.densification_interval == 0:
        key, sub = jax.random.split(key)
        ts, _dinfo = densify_event(ts, sub, cfg, scene.extent, scene.big_pose_verts, it)
    if it % cfg.opacity_reset_interval == 0:
        ts = ts._replace(gauss=G.reset_opacity(ts.gauss), opt_state=reset_opacity_moments(ts.opt_state))
    if it % 100 == 0:
        print(it, round(float(m["loss"]), 4), round(float(m["psnr"]), 2), int(ts.gauss.num_alive), flush=True)
else:
    print("completed without NaN", flush=True)
