"""Branch-B (PBR) step time + bake_occlusion time on the TPU, 512^2."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import time
import jax, jax.numpy as jnp, numpy as np
from mygauhuman_tpu.config import OptimizationConfig
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.models import gaussians as G
from mygauhuman_tpu.models.mlps import init_lbs_offset, init_pose_refiner
from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.pbr.light import prefilter_weight_set
from mygauhuman_tpu.train.pbr import (
    compute_knn3, create_pbr_state, make_pbr_train_step)
from mygauhuman_tpu.train.trainer import create_train_state
from mygauhuman_tpu.occlusion.baking import bake_occlusion
from mygauhuman_tpu.utils.transforms import rot_apply
from mygauhuman_tpu.render import render_frame

def bench(fn, args, label, n=32):
    out = jax.block_until_ready(fn(*args))
    start = time.perf_counter(); reps = 0
    while True:
        for _ in range(n):
            out = fn(*args); reps += 1
        jax.block_until_ready(out)
        if time.perf_counter() - start > 3.0: break
    dt = (time.perf_counter() - start) / reps * 1e3
    print(f"{label}: {dt:.2f} ms", flush=True)
    return dt

rc = RasterizerConfig(use_pallas=True, instance_capacity=65536)
scene = make_synthetic_scene(n_views=4, width=512, height=512, n_verts=6890,
                             capacity=8192, raster_config=rc)
cfg = OptimizationConfig(pbr_iteration=0)
ts, tx = create_train_state(cfg, scene.gt_state,
                            init_pose_refiner(jax.random.PRNGKey(0)),
                            init_lbs_offset(jax.random.PRNGKey(1)))
pbr_state, light_tx = create_pbr_state(cfg)
step = make_pbr_train_step(scene.smpl_model, tx, light_tx, cfg, rc,
                           bg=jnp.zeros(3))
knn3 = compute_knn3(ts.gauss)
occ = jnp.ones((ts.gauss.capacity, 3))
pw = jax.tree_util.tree_map(jnp.asarray, prefilter_weight_set(32))
b = scene.batches[0]

def pbr_step(ts_, pbr_):
    return step(ts_, pbr_, b, knn3, occ, pw, 0)
bench(lambda: None and None, (), "warm", n=1) if False else None
t_pbr = bench(pbr_step, (ts, pbr_state), "PBR train step (branch B)")

# bake one camera's occlusion
out = render_frame(ts.gauss, b.camera, b.frame, scene.smpl_model,
                   bg=jnp.zeros(3), active_sh_degree=0,
                   mlp_params={"pose_refiner": ts.pose_refiner,
                               "lbs_offset": ts.lbs_offset}, config=rc)
cov6 = G.get_covariance6(ts.gauss.params, 1.0, out.transforms)
means_posed = rot_apply(out.transforms, ts.gauss.params.xyz) + out.translation
wnrm = rot_apply(out.transforms, ts.gauss.params.normal)

@jax.jit
def bake(m, c, o, w, a):
    return bake_occlusion(m, c, o, w, a)[0]
t_bake = bench(bake, (means_posed, cov6, G.get_opacity(ts.gauss.params)[:, 0],
                      wnrm, ts.gauss.alive), "bake_occlusion (one camera)", n=4)
