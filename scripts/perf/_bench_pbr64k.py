"""PBR (branch-B) step anatomy at 64k capacity (VERDICT r4 next #4).

The full-pipeline steady-state number (152 ms/iter, PERF.md round-4 A->B
table) was unattributed. This measures, on the chip at the same
capacity/resolution:
  * the single-dispatch PBR step (with/without LPIPS),
  * the CHUNKED loop program the steady state actually runs
    (occlusion-stack dequantize + envmap recompute inside the jit),
  * forward components: G-buffer render, pbr_shading, build_mips,
    export_envmap+tv, KNN smoothness fwd+bwd,
  * an op-level trace aggregation of the chunk program.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import collections
import glob
import gzip
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mygauhuman_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from mygauhuman_tpu.config import OptimizationConfig
from mygauhuman_tpu.data.synthetic import make_synthetic_scene
from mygauhuman_tpu.eval.lpips import LPIPS
from mygauhuman_tpu.models import gaussians as G
from mygauhuman_tpu.models.mlps import init_lbs_offset, init_pose_refiner
from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.pbr.cubemap import latlong_to_cubemap
from mygauhuman_tpu.pbr.light import (
    build_mips,
    export_envmap,
    prefilter_weight_set,
)
from mygauhuman_tpu.pbr.shade import get_brdf_lut, pbr_shading
from mygauhuman_tpu.render import render_frame
from mygauhuman_tpu.train.pbr import (
    R_MAX,
    R_MIN,
    canonical_view_dirs,
    compute_knn3,
    create_pbr_state,
    make_pbr_train_step,
)
from mygauhuman_tpu.train.trainer import create_train_state

CAP = 65536
W = H = 512
rc = RasterizerConfig(use_pallas=True, instance_capacity=4 * CAP)
scene = make_synthetic_scene(n_views=4, width=W, height=H, n_verts=6890,
                             capacity=CAP, raster_config=rc)
cfg = OptimizationConfig(pbr_iteration=0)
ts, tx = create_train_state(cfg, scene.gt_state,
                            init_pose_refiner(jax.random.PRNGKey(0)),
                            init_lbs_offset(jax.random.PRNGKey(1)))
pbr_state, light_tx = create_pbr_state(cfg)
knn3 = compute_knn3(ts.gauss)
occ = jnp.ones((CAP, 3))
pw = jax.tree_util.tree_map(jnp.asarray, prefilter_weight_set(32))
b = scene.batches[0]
lp = LPIPS()


def bench(fn, args, label, n=16, budget=3.0):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    reps = 0
    while True:
        for _ in range(n):
            out = fn(*args)
            reps += 1
        jax.block_until_ready(out)
        if time.perf_counter() - start > budget:
            break
    dt = (time.perf_counter() - start) / reps * 1e3
    print(f"{label}: {dt:.2f} ms", flush=True)
    return dt


# ---- single-dispatch step ----
for use_lp, tag in ((None, "-lpips"), (lp, "+lpips")):
    step = make_pbr_train_step(scene.smpl_model, tx, light_tx, cfg, rc,
                               bg=jnp.zeros(3), lpips_fn=use_lp)
    bench(lambda t_, p_: step(t_, p_, b, knn3, occ, pw, 0)[2]["loss"],
          (ts, pbr_state), f"PBR step {tag}, cap 64k")

# ---- the chunked program the steady loop runs ----
step = make_pbr_train_step(scene.smpl_model, tx, light_tx, cfg, rc,
                           bg=jnp.zeros(3), lpips_fn=lp)
views = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *scene.batches)
# production occlusion-buffer shape: [slots, cap, bake_h=16, bake_w=32, 1]
occ_buf = jnp.full((4, CAP, 16, 32, 1), 255, jnp.uint8)
K = 8
idx = list(np.random.RandomState(0).randint(0, 4, size=K))
bidx = [int(i) for i in idx]


def chunk_call(ts_, pbr_):
    ts2, pbr2, (mseq, n) = step.chunk(
        ts_, pbr_, views, occ_buf, knn3, pw, idx, bidx, 0, pad_to=K)
    return mseq["loss"]


t_chunk = bench(chunk_call, (ts, pbr_state),
                f"PBR chunk ({K} iters), cap 64k", n=4)
print(f"  -> {t_chunk / K:.2f} ms/iter (chunked steady state)", flush=True)

# ---- forward components ----
mlps = {"pose_refiner": ts.pose_refiner, "lbs_offset": ts.lbs_offset}


@jax.jit
def gbuf(params):
    st = ts.gauss._replace(params=params)
    return render_frame(st, b.camera, b.frame, scene.smpl_model,
                        bg=jnp.zeros(3), active_sh_degree=0,
                        mlp_params=mlps, config=rc,
                        occlusion_color=occ).render


bench(gbuf, (ts.gauss.params,), "G-buffer render fwd (19ch + occlusion)")

out0 = jax.jit(lambda p: render_frame(
    ts.gauss._replace(params=p), b.camera, b.frame, scene.smpl_model,
    bg=jnp.zeros(3), active_sh_degree=0, mlp_params=mlps, config=rc,
    occlusion_color=occ))(ts.gauss.params)
vd = canonical_view_dirs(b.camera)
lut = get_brdf_lut()


@jax.jit
def shade(light_params, nrm, alb, rough, alpha, occ_img, vd, lut, pw):
    # G-buffers AND the prefilter weight set ride as ARGUMENTS:
    # closed-over arrays embed as literals and blow the remote-compile
    # request size limit
    light = build_mips(light_params, pw)
    return pbr_shading(
        light=light, normals=nrm * 2.0 - 1.0, view_dirs=vd,
        albedo=alb,
        roughness=rough[..., None] * (R_MAX - R_MIN) + R_MIN,
        mask=alpha[..., None], occlusion=occ_img[..., 0:1],
        brdf_lut=lut)["render_rgb"]


bench(shade, (pbr_state.light, out0.world_normal, out0.albedo,
              out0.roughness, out0.render_alpha, out0.occlusion, vd, lut,
              pw),
      "build_mips + pbr_shading fwd (512^2)")
@jax.jit
def shade_fwdbwd(light_params, nrm, alb, rough, alpha, occ_img, vd, lut,
                 pw):
    def f(lt, a, r):
        light = build_mips(lt, pw)
        rgb = pbr_shading(
            light=light, normals=nrm * 2.0 - 1.0, view_dirs=vd, albedo=a,
            roughness=r[..., None] * (R_MAX - R_MIN) + R_MIN,
            mask=alpha[..., None], occlusion=occ_img[..., 0:1],
            brdf_lut=lut)["render_rgb"]
        return jnp.sum(rgb)

    return jax.value_and_grad(f, argnums=(0, 1, 2))(light_params, alb,
                                                    rough)[0]


bench(shade_fwdbwd,
      (pbr_state.light, out0.world_normal, out0.albedo, out0.roughness,
       out0.render_alpha, out0.occlusion, vd, lut, pw),
      "build_mips + pbr_shading fwd+bwd (light/albedo/rough grads)")


@jax.jit
def gbuf_fwdbwd(params):
    def f(alb, rough, nrm):
        st = ts.gauss._replace(params=params._replace(
            albedo=alb, roughness=rough, normal=nrm))
        return jnp.sum(render_frame(
            st, b.camera, b.frame, scene.smpl_model, bg=jnp.zeros(3),
            active_sh_degree=0, mlp_params=mlps, config=rc,
            occlusion_color=occ).render)

    return jax.value_and_grad(f, argnums=(0, 1, 2))(
        params.albedo, params.roughness, params.normal)[0]


bench(gbuf_fwdbwd, (ts.gauss.params,),
      "G-buffer render fwd+bwd (material grads only)")

bench(jax.jit(lambda lt, w: build_mips(lt, w).diffuse),
      (pbr_state.light, pw), "build_mips alone")


@jax.jit
def shade_only(light, nrm, alb, rough, alpha, occ_img, vd, lut):
    # pbr_shading WITHOUT build_mips (light taken prebuilt)
    return pbr_shading(
        light=light, normals=nrm * 2.0 - 1.0, view_dirs=vd, albedo=alb,
        roughness=rough[..., None] * (R_MAX - R_MIN) + R_MIN,
        mask=alpha[..., None], occlusion=occ_img[..., 0:1],
        brdf_lut=lut)["render_rgb"]


light0 = jax.jit(lambda lt, w: build_mips(lt, w))(pbr_state.light, pw)
bench(shade_only, (light0, out0.world_normal, out0.albedo, out0.roughness,
                   out0.render_alpha, out0.occlusion, vd, lut),
      "pbr_shading alone (prebuilt mips)")
bench(jax.jit(lambda lt: export_envmap(lt, 64, 128)),
      (pbr_state.light,), "export_envmap 64x128")


@jax.jit
def smooth_fwdbwd(alb):
    from mygauhuman_tpu.train import losses as L

    def f(a):
        return L.relative_smooth_loss(
            a[knn3[:, 1]], a[knn3[:, 2]][:, None, :],
            ts.gauss.alive.astype(jnp.float32))

    return jax.value_and_grad(f)(alb)[0]


bench(smooth_fwdbwd, (G.get_albedo(ts.gauss.params),),
      "KNN smoothness fwd+bwd (64k)")

# ---- op-level trace of the chunk program ----
tdir = "/tmp/trace_pbr64k"
os.system(f"rm -rf {tdir}")
jax.block_until_ready(chunk_call(ts, pbr_state))
with jax.profiler.trace(tdir):
    jax.block_until_ready(chunk_call(ts, pbr_state))
fs = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
agg = collections.Counter()
for f in fs:
    for e in json.load(gzip.open(f))["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "")
            if name.startswith(("jit_", "while")):
                continue
            agg[name] += e["dur"]
print(f"\nop-level aggregation of one {K}-iter chunk (us total, /K for "
      f"per-iter):", flush=True)
for name, us in agg.most_common(18):
    print(f"{us:9.0f} us  {us / K:8.1f} us/iter  {name[:80]}", flush=True)
