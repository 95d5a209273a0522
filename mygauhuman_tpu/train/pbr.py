"""PBR training branch (reference train.py loss branch B, :294-363).

After `pbr_iteration` the geometry freezes and optimization switches to
materials + light: split-sum shade the rendered G-buffers (world normal,
albedo, roughness, occlusion, alpha) against ground truth, with BRDF TV,
KDE-entropy, KNN material smoothness, lambertian and envmap-TV regularizers.
A second Adam drives the cubemap light + irradiance volumes
(train.py:155-164, both at opacity_lr; the volumes are stepped but unused by
the loss — reference parity).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from mygauhuman_tpu.config import OptimizationConfig
from mygauhuman_tpu.data.camera import Camera
from mygauhuman_tpu.models import gaussians as G
from mygauhuman_tpu.models.smpl import SMPLModel
from mygauhuman_tpu.occlusion.volumes import IrradianceVolumes, init_irradiance_volumes
from mygauhuman_tpu.ops.knn import knn
from mygauhuman_tpu.ops.rasterize import RasterizerConfig
from mygauhuman_tpu.pbr.light import build_mips, export_envmap, init_cubemap_light
from mygauhuman_tpu.pbr.shade import get_brdf_lut, pbr_shading_planar
from mygauhuman_tpu.render import render_frame
from mygauhuman_tpu.train import losses as L
from mygauhuman_tpu.train.optim import TrainableParams
from mygauhuman_tpu.train.trainer import TrainBatch, TrainState, trainable_params

R_MAX, R_MIN = 1.0, 0.04   # roughness remap (train.py:233-235)


class PbrState(NamedTuple):
    light: dict                    # {"base": [6, R, R, 3]}
    volumes: IrradianceVolumes
    opt_state: Any


def create_pbr_state(
    cfg: OptimizationConfig,
    bound: float = 1.5,
    base_res: int = 32,
) -> tuple[PbrState, optax.GradientTransformation]:
    """Light + volumes with one Adam at opacity_lr (train.py:145-164)."""
    light = init_cubemap_light(base_res)
    volumes = init_irradiance_volumes(
        [-bound, -bound, -bound, bound, bound, bound]
    )
    tx = optax.adam(cfg.opacity_lr, eps=1e-15)
    params = {"light": light, "volumes": volumes.coefficients}
    return PbrState(light=light, volumes=volumes, opt_state=tx.init(params)), tx


def canonical_view_dirs(camera: Camera) -> jnp.ndarray:
    """Per-pixel world-space surface->camera directions [H, W, 3].

    Parity: get_canonical_rays (scene/__init__.py:129-161) + the train-loop
    transform (train.py:237-243): -(normalize(rays) @ c2w_rot rows).
    """
    H, W = camera.height, camera.width
    focal_x = W / (2.0 * camera.tan_fovx)
    focal_y = H / (2.0 * camera.tan_fovy)
    x = (jnp.arange(W, dtype=jnp.float32) - W / 2 + 0.5) / focal_x
    y = (jnp.arange(H, dtype=jnp.float32) - H / 2 + 0.5) / focal_y
    dirs = jnp.stack(
        [
            jnp.broadcast_to(x[None, :], (H, W)),
            jnp.broadcast_to(y[:, None], (H, W)),
            jnp.ones((H, W), jnp.float32),
        ],
        axis=-1,
    )
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    R_c2w = camera.w2c[:3, :3].T
    world = jnp.einsum("hwc,rc->hwr", dirs, R_c2w)
    return -world


def compute_knn3(state: G.GaussianState) -> jnp.ndarray:
    """[cap, 3] self-KNN neighbor ids among alive Gaussians, captured once at
    the PBR transition (reference get_knn_3, gaussian_model.py:175-177 /
    train.py:292-293)."""
    far = jnp.where(state.alive[:, None], state.params.xyz, 1e6)
    _, idx = knn(far, far, k=3, exclude_self=True)
    return idx


def compute_losses_pbr(
    out,
    batch: TrainBatch,
    light_params: dict,
    albedo_pts: jnp.ndarray,   # [cap, 3] activated albedo (GLOBAL capacity)
    rough_pts: jnp.ndarray,    # [cap, 1] activated roughness (GLOBAL)
    alive_f: jnp.ndarray,      # [cap] float alive mask (GLOBAL)
    knn3: jnp.ndarray,
    view_dirs: jnp.ndarray,
    brdf_lut: jnp.ndarray,
    lpips_fn: Callable | None = None,
    prefilter_w: dict | None = None,
):
    """Branch-B total loss. Weights parity: train.py:316-363.

    The per-point material arrays are taken pre-activated at GLOBAL
    capacity because `knn3` holds global neighbor ids — the tile-sharded
    step all_gathers its local material shards before calling this."""
    light = build_mips(light_params, prefilter_w)
    alpha = out.render_alpha[..., None]
    roughness_img = out.roughness[..., None] * (R_MAX - R_MIN) + R_MIN
    occlusion_img = out.occlusion[..., 0:1]

    # PLANAR shading: the rasterizer's G-buffers are channel-planar on
    # device, and channel-minor sampling made XLA emit slow scalar-path
    # gathers (46 ms of the 130 ms step — PERF.md round-5 PBR anatomy).
    # Planes are sliced (free on the planar layout), the shading runs
    # entirely on [H, W] planes, and the one real relayout is the final
    # interleave of rgb for the channel-minor loss stack.
    sg = jax.lax.stop_gradient
    planes = lambda img: tuple(img[..., c] for c in range(3))  # noqa: E731
    pbr = pbr_shading_planar(
        light=light,
        normals=tuple(sg(p * 2.0 - 1.0) for p in planes(out.world_normal)),
        view_dirs=planes(view_dirs),
        albedo=planes(out.albedo),
        roughness=out.roughness * (R_MAX - R_MIN) + R_MIN,
        mask=out.render_alpha,
        occlusion=out.occlusion[..., 0],
        brdf_lut=brdf_lut,
        tone=False,
        gamma=False,
    )
    rgb = jnp.stack(pbr["render_rgb"], axis=-1)

    bm = batch.bound_mask.astype(jnp.float32)
    ll1 = L.masked_l1(rgb, batch.gt_image, bm)
    ssim_val = L.ssim(rgb, batch.gt_image, bm)
    lpips_val = lpips_fn(rgb, batch.gt_image) if lpips_fn else jnp.zeros(())

    brdf_img = jnp.concatenate([out.albedo, roughness_img], axis=-1)
    brdf_tv = L.masked_tv_loss(out.render_alpha, brdf_img)
    entropy = L.gaussian_entropy(out.albedo) + L.gaussian_entropy(
        roughness_img
    )

    smooth = L.relative_smooth_loss(
        albedo_pts[knn3[:, 1]], albedo_pts[knn3[:, 2]][:, None, :], alive_f
    ) + L.relative_smooth_loss(
        rough_pts[knn3[:, 1]], rough_pts[knn3[:, 2]][:, None, :], alive_f
    )

    lamb = jnp.sum(
        (1.0 - roughness_img[..., 0]) * (out.render_alpha > 0)
    ) / jnp.maximum(jnp.sum(out.render_alpha > 0), 1.0)

    env = export_envmap(light_params, 64, 128)
    env_tv = L.tv_loss(env)

    total = (
        ll1
        + 0.01 * (1.0 - ssim_val)
        + 0.01 * lpips_val
        + 1.0 * brdf_tv
        + 5.0e-5 * entropy
        + 0.1 * smooth
        + 0.001 * lamb
        + 0.01 * env_tv
    )
    metrics = {
        "loss": total,
        "l1": ll1,
        "ssim": ssim_val,
        "lpips_term": lpips_val,   # loss-term value, backbone-agnostic
        "brdf_tv": brdf_tv,
        "entropy": entropy,
        "smooth": smooth,
        "lamb": lamb,
        "env_tv": env_tv,
        "psnr": L.psnr(rgb, batch.gt_image),
    }
    return total, metrics


def make_pbr_train_step(
    smpl_model: SMPLModel,
    tx: optax.GradientTransformation,
    light_tx: optax.GradientTransformation,
    cfg: OptimizationConfig,
    raster_config: RasterizerConfig,
    bg: jnp.ndarray,
    lpips_fn: Callable | None = None,
):
    """Jitted PBR step: materials (albedo/roughness via the scene optimizer)
    + light/volumes (light optimizer). Geometry gradients are zeroed exactly
    as update_learning_rate freezes them (gaussian_model.py:289-307).

    The returned `step` also carries `step.chunk`, a fori_loop program that
    runs up to K iterations in ONE dispatch over a device-resident [V, ...]
    view stack + [V, cap, H, W, 1] baked-occlusion stack, recomputing the
    grayscale environment modulation from the CURRENT light inside the jit
    region each trip (the eager per-iteration `export_envmap` + single-step
    dispatch pattern cost 105-524 ms/iter of pure tunnel latency, PERF.md).

    SMPL tensors + the BRDF LUT ride the jit boundary as arguments
    (closed-over arrays embed as executable constants — see
    trainer.make_train_step).
    """
    from mygauhuman_tpu.eval.lpips import lpips_distance

    consts = {
        "smpl": {
            "v_template": smpl_model.v_template,
            "shapedirs": smpl_model.shapedirs,
            "posedirs": smpl_model.posedirs,
            "j_regressor": smpl_model.j_regressor,
            "weights": smpl_model.weights,
        },
        "brdf_lut": get_brdf_lut(),
        "lpips": getattr(lpips_fn, "params", None),
    }

    def _step_impl(
        ts: TrainState,
        pbr_state: PbrState,
        batch: TrainBatch,
        knn3: jnp.ndarray,
        occlusion_color: jnp.ndarray,    # [cap, 3] baked (or opacity fallback)
        prefilter_w: dict,               # constant prefilter weight matrices
        consts: dict,
        active_sh_degree: int,
    ):
        smpl = smpl_model._replace(**consts["smpl"])
        brdf_lut = consts["brdf_lut"]
        if consts["lpips"] is not None:
            lp = consts["lpips"]
            lfn = lambda a, b: lpips_distance(lp, a, b)  # noqa: E731
        else:
            lfn = lpips_fn
        view_dirs = canonical_view_dirs(batch.camera)

        def loss_fn(params: TrainableParams, light_vol: dict):
            # Geometry is FROZEN in phase B (gaussian_model.py:289-307):
            # stop_gradient the frozen leaves HERE so AD never builds the
            # geometry backward at all (projection/binning/LBS/SMPL/MLP
            # transposes) instead of computing those grads and zeroing
            # them after — the grads fed to the optimizer are identical
            # (structural zeros), the step is materially cheaper (PERF.md
            # round-5 PBR-step anatomy).
            sg = jax.lax.stop_gradient
            g = params.gaussians
            gstate = ts.gauss._replace(params=g._replace(
                xyz=sg(g.xyz), features_dc=sg(g.features_dc),
                features_rest=sg(g.features_rest), scaling=sg(g.scaling),
                rotation=sg(g.rotation), opacity=sg(g.opacity),
            ))
            mlps = {
                "pose_refiner": sg(params.pose_refiner),
                "lbs_offset": sg(params.lbs_offset),
            }
            out = render_frame(
                gstate, batch.camera, batch.frame, smpl,
                bg=bg, active_sh_degree=active_sh_degree, mlp_params=mlps,
                config=raster_config, occlusion_color=occlusion_color,
            )
            total, metrics = compute_losses_pbr(
                out, batch, light_vol["light"],
                G.get_albedo(params.gaussians),
                G.get_roughness(params.gaussians),
                ts.gauss.alive.astype(jnp.float32),
                knn3, view_dirs, brdf_lut, lfn,
                prefilter_w,
            )
            return total, metrics

        light_vol = {
            "light": pbr_state.light,
            "volumes": pbr_state.volumes.coefficients,
        }
        (_, metrics), (gparams, glight) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(trainable_params(ts), light_vol)

        # geometry frozen: only materials (albedo/roughness/normal) update
        def zero(tree):
            return jax.tree_util.tree_map(jnp.zeros_like, tree)

        g = gparams.gaussians
        gparams = TrainableParams(
            gaussians=g._replace(
                xyz=jnp.zeros_like(g.xyz),
                features_dc=jnp.zeros_like(g.features_dc),
                features_rest=jnp.zeros_like(g.features_rest),
                scaling=jnp.zeros_like(g.scaling),
                rotation=jnp.zeros_like(g.rotation),
                opacity=jnp.zeros_like(g.opacity),
            ),
            pose_refiner=zero(gparams.pose_refiner),
            lbs_offset=zero(gparams.lbs_offset),
        )

        params = trainable_params(ts)
        updates, opt_state = tx.update(gparams, ts.opt_state, params)
        new_params = optax.apply_updates(params, updates)

        lupdates, lopt_state = light_tx.update(
            glight, pbr_state.opt_state, light_vol
        )
        new_light_vol = optax.apply_updates(light_vol, lupdates)
        # clamp_ parity (train.py:423): light stays non-negative
        new_light = {"base": jnp.maximum(new_light_vol["light"]["base"], 0.0)}

        new_ts = TrainState(
            gauss=ts.gauss._replace(params=new_params.gaussians),
            pose_refiner=new_params.pose_refiner,
            lbs_offset=new_params.lbs_offset,
            opt_state=opt_state,
            step=ts.step + 1,
        )
        new_pbr = PbrState(
            light=new_light,
            volumes=pbr_state.volumes._replace(
                coefficients=new_light_vol["volumes"]
            ),
            opt_state=lopt_state,
        )
        return new_ts, new_pbr, metrics

    _step = functools.partial(jax.jit, static_argnums=(7,))(_step_impl)

    def step(ts, pbr_state, batch, knn3, occlusion_color, prefilter_w,
             active_sh_degree: int):
        return _step(ts, pbr_state, batch, knn3, occlusion_color,
                     prefilter_w, consts, int(active_sh_degree))

    from mygauhuman_tpu.occlusion.baking import occlusion_color as occ_color
    from mygauhuman_tpu.pbr.light import export_envmap as _export_env

    @functools.partial(jax.jit, static_argnums=(10,))
    def _chunk(ts, pbr_state, views, occ_buf, knn3, prefilter_w, consts,
               idx, bidx, n, active_sh_degree):
        """Up to len(idx) PBR iterations in ONE dispatch (mirrors the phase-A
        chunk program, trainer.py): dynamic-trip fori_loop, traced trip
        count `n` so every chunk length shares one executable. Each trip
        gathers its view + its camera's baked occlusion map (slot bidx[t]
        of the bounded uint8 buffer — NOT a per-view stack, which scaled as
        V x cap x bake pixels, ADVICE r4 medium) on device and re-derives
        the occlusion modulation color from the trip's CURRENT light
        (train.py:196-198 does this eagerly per step)."""
        bh, bw = occ_buf.shape[2], occ_buf.shape[3]

        def dq(u8):
            return u8.astype(jnp.float32) * (1.0 / 255.0)

        mshape = jax.eval_shape(
            lambda ts, pbr, b, occ: _step_impl(
                ts, pbr, b, knn3,
                occ_color(occ, jnp.zeros((bh, bw, 1))),
                prefilter_w, consts, active_sh_degree)[2],
            ts, pbr_state,
            jax.tree_util.tree_map(lambda x: x[0], views), dq(occ_buf[0]))
        mbuf = jax.tree_util.tree_map(
            lambda s: jnp.zeros((idx.shape[0],) + s.shape, s.dtype), mshape)

        def body(t, carry):
            ts, pbr, mbuf = carry
            batch = jax.tree_util.tree_map(lambda x: x[idx[t]], views)
            env = _export_env(pbr.light, bh, bw)
            env_gray = jnp.mean(env, axis=-1, keepdims=True)
            occ_col = occ_color(dq(occ_buf[bidx[t]]), env_gray)
            ts, pbr, m = _step_impl(
                ts, pbr, batch, knn3, occ_col, prefilter_w, consts,
                active_sh_degree)
            mbuf = jax.tree_util.tree_map(
                lambda buf, v: buf.at[t].set(v), mbuf, m)
            return ts, pbr, mbuf

        return jax.lax.fori_loop(0, n, body, (ts, pbr_state, mbuf))

    def chunk(ts, pbr_state, views, occ_buf, knn3, prefilter_w, idx, bidx,
              active_sh_degree: int, pad_to: int = 0):
        n = len(idx)
        pad_to = max(pad_to, n)
        idx = list(idx) + [0] * (pad_to - n)
        bidx = list(bidx) + [0] * (pad_to - n)
        ts, pbr_state, mseq = _chunk(
            ts, pbr_state, views, occ_buf, knn3, prefilter_w, consts,
            jnp.asarray(idx, jnp.int32), jnp.asarray(bidx, jnp.int32),
            jnp.int32(n), int(active_sh_degree))
        return ts, pbr_state, (mseq, n)

    step.chunk = chunk
    step.jitted = _step          # exposed for AOT/introspection tooling
    step.consts = consts
    return step


def train_loop_pbr(
    ts: TrainState,
    pbr_state: PbrState,
    step_fn,
    batches: list,
    smpl_model: SMPLModel,
    cfg: OptimizationConfig,
    *,
    start_iteration: int,
    num_iterations: int,
    max_sh_degree: int = 3,
    seed: int = 0,
    bake_height: int = 16,
    bake_width: int = 32,
    bake_max_cells: int = 128,
    bake_full_coverage: bool = True,
    callback=None,
    scan_chunk: int = 1,
    callback_iters: tuple = (),
    occ_budget_mb: float = 1024.0,
):
    """PBR-phase loop (train.py iter > pbr_iteration): per-camera occlusion
    maps are baked once on first visit (view.set_occlusion parity,
    gaussian_renderer/__init__.py:152-160) and modulated by the CURRENT
    grayscale envmap each step (train.py:196-198).

    bake_full_coverage (default) sweeps EVERY occupied voxel in
    `bake_max_cells`-sized windows (reference parity, baking.py:145-202) —
    bake_out_of_budget stays 0; False restores the single-sweep budget.

    Baked maps are cached per camera as uint8 (quantization step 1/255 —
    below the rasterizer's own 1/255 alpha cutoff), 4x smaller than f32 and
    allocated ONLY for visited cameras (ADVICE r4 medium: the old code
    preallocated a [V, cap, H, W, 1] f32 stack for every view up front).

    scan_chunk > 1 dispatches up to that many iterations per jitted call via
    `step_fn.chunk` — the envmap export + occlusion modulation move inside
    the jit region (the eager-per-step form was dispatch-bound, PERF.md).
    The chunk program reads occlusion from a bounded [K, cap, H, W, 1]
    uint8 slot buffer holding at most K distinct cameras, K sized by
    `occ_budget_mb`; a chunk whose views would exceed K distinct cameras is
    split early (the view SEQUENCE is unchanged — only dispatch boundaries
    move). Chunks never cross an SH-degree change or an iteration in
    `callback_iters`, so the schedule is identical to scan_chunk=1.

    The callback fires once per iteration in BOTH modes; in chunked mode
    per-iteration metrics are replayed from the chunk's metric buffer
    (one host transfer per chunk), while the `ts`/`pbr_state` arguments for
    mid-chunk iterations are the end-of-chunk states (chunks break at
    `callback_iters`, so checkpoint/eval iterations always see exact
    states).
    """
    import numpy as np

    from mygauhuman_tpu.occlusion.baking import (
        bake_occlusion,
        bake_occlusion_full,
        occlusion_color,
    )
    from mygauhuman_tpu.pbr.light import export_envmap, prefilter_weight_set
    from mygauhuman_tpu.render import render_frame
    from mygauhuman_tpu.utils.transforms import rot_apply

    host_rng = np.random.RandomState(seed + 7)
    # constant GGX/cosine prefilter matrices, computed ONCE (not per step)
    prefilter_w = jax.tree_util.tree_map(
        jnp.asarray, prefilter_weight_set(pbr_state.light["base"].shape[1])
    )
    knn3 = compute_knn3(ts.gauss)
    stack: list = []
    metrics: dict = {}
    bake_oob_total = 0            # baked-but-out-of-budget Gaussians, summed
    occ_cache: dict = {}          # camera index -> uint8 [cap, H, W, 1]
    chunked = scan_chunk > 1 and hasattr(step_fn, "chunk")
    cb_set = set(int(i) for i in callback_iters)
    cap = ts.gauss.capacity
    if chunked:
        views = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
        bytes_per_view = cap * bake_height * bake_width   # uint8
        k_max = max(1, min(
            scan_chunk, len(batches),
            int(occ_budget_mb * 1e6) // max(bytes_per_view, 1),
        ))
        occ_buf = jnp.zeros(
            (k_max, cap, bake_height, bake_width, 1), jnp.uint8)
        slot_of: dict = {}        # camera index -> buffer slot

    _smpl_consts = {
        "v_template": smpl_model.v_template,
        "shapedirs": smpl_model.shapedirs,
        "posedirs": smpl_model.posedirs,
        "j_regressor": smpl_model.j_regressor,
        "weights": smpl_model.weights,
    }

    @jax.jit
    def _pose_for_bake(ts, batch, smpl_c):
        """Geometry is frozen in phase B, so the LBS transforms (and hence
        the bake) are per-camera constants; SH degree does not affect them."""
        out = render_frame(
            ts.gauss, batch.camera, batch.frame,
            smpl_model._replace(**smpl_c),
            bg=jnp.zeros(3), active_sh_degree=0,
            mlp_params={"pose_refiner": ts.pose_refiner,
                        "lbs_offset": ts.lbs_offset},
        )
        cov6 = G.get_covariance6(ts.gauss.params, 1.0, out.transforms)
        means_posed = rot_apply(
            out.transforms, ts.gauss.params.xyz
        ) + out.translation
        world_nrm = rot_apply(out.transforms, ts.gauss.params.normal)
        return jax.lax.stop_gradient(
            (means_posed, cov6, G.get_opacity(ts.gauss.params)[:, 0],
             world_nrm)
        )

    def ensure_baked(bi):
        """Bake camera bi's per-Gaussian visibility envmaps once; count any
        out-of-budget truncation (never silent — VERDICT r1 #4 / r3 #7;
        zero by construction under bake_full_coverage)."""
        nonlocal bake_oob_total
        if bi in occ_cache:
            return
        m, c6, op, wn = _pose_for_bake(ts, batches[bi], _smpl_consts)
        if bake_full_coverage:
            occ, bake_oob, _ = bake_occlusion_full(
                m, c6, op, wn, ts.gauss.alive,
                height=bake_height, width=bake_width,
                sweep_cells=bake_max_cells,
            )
        else:
            occ, bake_oob = bake_occlusion(
                m, c6, op, wn, ts.gauss.alive,
                height=bake_height, width=bake_width,
                max_cells=bake_max_cells,
            )
        bake_oob_total += int(bake_oob)
        occ_cache[bi] = jnp.round(occ * 255.0).astype(jnp.uint8)

    def ensure_in_buffer(bi, keep: set) -> None:
        """Place camera bi's baked map into a free slot of the bounded
        buffer, evicting a camera not referenced by the current chunk."""
        nonlocal occ_buf
        if bi in slot_of:
            return
        ensure_baked(bi)
        if len(slot_of) < k_max:
            slot = len(slot_of)
        else:
            victim = next(k for k in slot_of if k not in keep)
            slot = slot_of.pop(victim)
        occ_buf = occ_buf.at[slot].set(occ_cache[bi])
        slot_of[bi] = slot

    def pick_index():
        nonlocal stack
        if not stack:
            stack = list(range(len(batches)))
        return stack.pop(host_rng.randint(len(stack)))

    def chunk_end(it):
        end = min(it + scan_chunk - 1, start_iteration + num_iterations)
        end = min(end, (it // 1000 + 1) * 1000 - 1)   # static SH per chunk
        for e in range(it, end + 1):
            if e in cb_set:
                return e
        return end

    def dq(u8):
        return u8.astype(jnp.float32) * (1.0 / 255.0)

    pending = None    # view picked for a chunk that hit the buffer limit
    it = start_iteration + 1
    while it <= start_iteration + num_iterations:
        deg = min(it // 1000, max_sh_degree)
        if chunked:
            end = chunk_end(it)
            idx: list = []
            distinct: set = set()
            for _ in range(it, end + 1):
                bi = pending if pending is not None else pick_index()
                pending = None
                if bi not in distinct and len(distinct) >= k_max:
                    pending = bi       # next chunk starts with this view
                    break
                distinct.add(bi)
                idx.append(bi)
            end = it + len(idx) - 1
            for bi in idx:
                ensure_in_buffer(bi, distinct)
            bidx = [slot_of[bi] for bi in idx]
            ts, pbr_state, (mseq, n) = step_fn.chunk(
                ts, pbr_state, views, occ_buf, knn3, prefilter_w, idx,
                bidx, deg, pad_to=scan_chunk)
            mseq_host = jax.tree_util.tree_map(np.asarray, mseq)
            for t in range(n):
                metrics = jax.tree_util.tree_map(
                    lambda x: x[t], mseq_host)
                metrics = dict(metrics)
                metrics["bake_out_of_budget"] = bake_oob_total
                if callback is not None:
                    callback(it + t, ts, pbr_state, metrics)
            it = end
        else:
            bi = pick_index()
            ensure_baked(bi)
            env = export_envmap(pbr_state.light, bake_height, bake_width)
            env_gray = jnp.mean(env, axis=-1, keepdims=True)
            occ_col = occlusion_color(dq(occ_cache[bi]), env_gray)
            ts, pbr_state, metrics = step_fn(
                ts, pbr_state, batches[bi], knn3, occ_col, prefilter_w, deg
            )
            metrics = dict(metrics)
            metrics["bake_out_of_budget"] = bake_oob_total
            if callback is not None:
                callback(it, ts, pbr_state, metrics)
        it += 1
    return ts, pbr_state, metrics
