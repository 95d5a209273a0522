"""Training loop: jitted train step + densify schedule + opacity resets.

Re-derivation of `train.py:128-434` (loss branch A; the PBR branch B plugs in
once the pbr/ stack lands). One fused jit region per (capacity, sh_degree)
covers render -> loss -> backward -> Adam update -> densify-stat
accumulation; densify/prune/reset events run as separate jitted ops on the
schedule (every `densification_interval` iters inside
[densify_from, densify_until), reset every `opacity_reset_interval`).

Gradient flow for densification stats: the reference harvests
`screenspace_points.grad` (train.py:403-404); here the loss is differentiated
w.r.t. the explicit `means2d_offset` zeros input and scaled to reference NDC
units by `densify_grad_scale` (ops/rasterize.py).
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
from mygauhuman_tpu.ops.rasterize import RasterizerConfig, densify_grad_scale
from mygauhuman_tpu.render import FrameInputs, render_frame
from mygauhuman_tpu.train import losses as L
from mygauhuman_tpu.train.optim import (
    TrainableParams,
    geometry_freeze_mask,
    make_optimizer,
    reset_adam_slots,
)


class TrainBatch(NamedTuple):
    """One training view: camera + ground truth + masks + SMPL frame."""

    camera: Camera
    frame: FrameInputs
    gt_image: jnp.ndarray     # [H, W, 3]
    gt_normal: jnp.ndarray    # [H, W, 3] in [0,1] display encoding
    bkgd_mask: jnp.ndarray    # [H, W] 1 = person
    bound_mask: jnp.ndarray   # [H, W] 1 = inside projected SMPL bbox


class TrainState(NamedTuple):
    gauss: G.GaussianState
    pose_refiner: Any
    lbs_offset: Any
    opt_state: Any
    step: jnp.ndarray


def trainable_params(ts: TrainState) -> TrainableParams:
    return TrainableParams(
        gaussians=ts.gauss.params,
        pose_refiner=ts.pose_refiner,
        lbs_offset=ts.lbs_offset,
    )


def create_train_state(
    cfg: OptimizationConfig,
    gauss: G.GaussianState,
    pose_refiner: Any,
    lbs_offset: Any,
    spatial_lr_scale: float = 1.0,
) -> tuple[TrainState, optax.GradientTransformation]:
    params = TrainableParams(gauss.params, pose_refiner, lbs_offset)
    tx = make_optimizer(cfg, params, spatial_lr_scale)
    # one jitted program: eager init dispatched ~100 tiny zeros_like ops
    # through the remote tunnel (~20 s/process at 64k capacity)
    opt_state = jax.jit(tx.init)(params)
    return TrainState(
        gauss=gauss,
        pose_refiner=pose_refiner,
        lbs_offset=lbs_offset,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
    ), tx


#: Static side length of the LPIPS crop window. On ZJU-format data the
#: subject's bound-mask bbox fits comfortably inside 384x384 of the 512x512
#: frame; anything the window misses was already zeroed by the mask on BOTH
#: images, so the distance is unaffected in the common case and merely
#: under-crops (extra zero border) in the worst case. Callers that know the
#: scene's real max bbox (cli/train computes it from the bound masks at
#: setup) pass a tighter `lpips_crop` — the VGG cost scales with the
#: window area, ~4 ms/step between 384^2 and 320^2 at 512^2 frames.
LPIPS_CROP = 384


def scene_lpips_crop(bound_masks, pad: int = 8, align: int = 32) -> int:
    """Tightest static LPIPS window covering every view's bound-mask bbox
    (+pad), rounded up to `align`. Returns the side length."""
    import numpy as np

    ext = 1
    for bm in bound_masks:
        bm = np.asarray(bm) > 0
        if not bm.any():
            continue
        rows = np.nonzero(bm.any(axis=1))[0]
        cols = np.nonzero(bm.any(axis=0))[0]
        ext = max(ext, rows[-1] - rows[0] + 1, cols[-1] - cols[0] + 1)
    side = -(-(ext + 2 * pad) // align) * align
    return int(min(side, max(np.asarray(b).shape[0] for b in bound_masks),
                   max(np.asarray(b).shape[1] for b in bound_masks)))


def _lpips_crop(stack: jnp.ndarray, bm: jnp.ndarray,
                crop: int = LPIPS_CROP) -> jnp.ndarray:
    """Crop [K, H, W, 3] to the static LPIPS window centered on mask bbox."""
    H, W = bm.shape
    ch, cw = min(crop, H), min(crop, W)
    if (ch, cw) == (H, W):
        return stack
    on = bm > 0
    rows, cols = jnp.any(on, axis=1), jnp.any(on, axis=0)
    y0, x0 = jnp.argmax(rows), jnp.argmax(cols)
    y1, x1 = H - jnp.argmax(rows[::-1]), W - jnp.argmax(cols[::-1])
    ys = jnp.clip((y0 + y1) // 2 - ch // 2, 0, H - ch)
    xs = jnp.clip((x0 + x1) // 2 - cw // 2, 0, W - cw)
    return jax.lax.dynamic_slice(
        stack, (0, ys, xs, 0), (stack.shape[0], ch, cw, 3)
    )


def compute_losses_a(
    out,
    batch: TrainBatch,
    scaling_mean: jnp.ndarray,
    lpips_fn: Callable | None = None,
    lpips_crop: int = LPIPS_CROP,
) -> tuple[jnp.ndarray, dict]:
    """Loss branch A (iter <= pbr_iteration), train.py:256-291.

    total = L1(bound) + 0.1*maskL2 + normalL1 + axisL1 + 0.01*lpips
            + 0.01*(1 - ssim) + 0.01*normal_TV + mean(scaling)
    """
    bm = batch.bound_mask.astype(jnp.float32)
    ll1 = L.masked_l1(out.render, batch.gt_image, bm)
    mask_loss = L.masked_l2(out.render_alpha, batch.bkgd_mask.astype(jnp.float32), bm)
    normal_loss = L.masked_l1(out.normal, batch.gt_normal, bm)
    axis_loss = L.masked_l1(out.render_axis, batch.gt_normal, bm)
    ssim_val = L.ssim(out.render, batch.gt_image, bm) + L.ssim(
        out.normal, batch.gt_normal, bm
    )
    if lpips_fn is not None:
        # Reference computes lpips on the bound-mask bounding-rect crop
        # (train.py:269-281) — a dynamic shape. Static-shape equivalent:
        # zero outside the mask (VGG features are local, identical zero
        # regions contribute ~nothing), then dynamic_slice a STATIC-size
        # window centered on the mask bbox — the crop start is traced, the
        # size is not, so the VGG cost scales with the subject, not the
        # frame. Both lpips pairs ride ONE batched VGG pass.
        bm3 = bm[..., None]
        stack = jnp.stack([
            out.render * bm3, batch.gt_image * bm3,
            out.normal * bm3, batch.gt_normal * bm3,
        ])
        crop = _lpips_crop(stack, bm, lpips_crop)
        lpips_val = jnp.sum(lpips_fn(crop[0::2], crop[1::2]))
    else:
        lpips_val = jnp.zeros(())
    tv = L.masked_tv_loss(out.render_alpha, out.normal)

    total = (
        ll1
        + 0.1 * mask_loss
        + normal_loss
        + axis_loss
        + 0.01 * lpips_val
        + 0.01 * (2.0 - ssim_val)   # two ssim terms, each "1 - ssim"
        + 0.01 * tv
        + scaling_mean
    )
    metrics = {
        "loss": total,
        "l1": ll1,
        "mask": mask_loss,
        "normal": normal_loss,
        "axis": axis_loss,
        "ssim": ssim_val,
        # loss-TERM value (whatever backbone lpips_fn uses — random-VGG by
        # default); named to never collide with the published-LPIPS metric
        "lpips_term": lpips_val,
        "tv": tv,
        "scaling_mean": scaling_mean,
        "psnr": L.psnr(out.render, batch.gt_image),
    }
    return total, metrics


def make_train_step(
    smpl_model: SMPLModel,
    tx: optax.GradientTransformation,
    cfg: OptimizationConfig,
    raster_config: RasterizerConfig,
    bg: jnp.ndarray,
    lpips_fn: Callable | None = None,
    donate: bool = False,
    lpips_crop: int = LPIPS_CROP,
):
    """Build the jitted train step. Retraces per (capacity, sh_degree).

    donate=True updates the params + Adam-moment buffers (~50 MB at 64k
    capacity) in place instead of copying them every step — the production
    train-loop mode. Leave False when the SAME TrainState is fed to the step
    more than once (determinism tests, benchmarks).

    Large model constants (the SMPL tensors, the LPIPS backbone weights) are
    threaded through the jit boundary as ARGUMENTS, not closures: closed-over
    arrays embed as dense literals in the serialized executable (~17 MB of
    posedirs + ~134 MB of VGG weights incl. their AD transposes per
    signature), which in a remote-compile environment turns every
    persistent-cache load into a 100+ MB transfer."""
    from mygauhuman_tpu.eval.lpips import lpips_distance

    smpl_consts = {
        "v_template": smpl_model.v_template,
        "shapedirs": smpl_model.shapedirs,
        "posedirs": smpl_model.posedirs,
        "j_regressor": smpl_model.j_regressor,
        "weights": smpl_model.weights,
    }
    if lpips_fn is None:
        lpips_consts = None
    elif hasattr(lpips_fn, "params"):
        lpips_consts = lpips_fn.params
    else:                       # bare callable: legacy closure behavior
        lpips_consts = None
    consts = {"smpl": smpl_consts, "lpips": lpips_consts}

    def _step_impl(ts: TrainState, batch: TrainBatch, consts,
                   active_sh_degree: int):
        smpl = smpl_model._replace(**consts["smpl"])
        lp = consts["lpips"]
        if lp is not None:
            lfn = lambda a, b: lpips_distance(lp, a, b)  # noqa: E731
        else:
            lfn = lpips_fn
        cap = ts.gauss.capacity
        zeros2d = jnp.zeros((cap, 2), jnp.float32)

        def loss_fn(params: TrainableParams, m2d_off):
            gstate = ts.gauss._replace(params=params.gaussians)
            mlps = {
                "pose_refiner": params.pose_refiner,
                "lbs_offset": params.lbs_offset,
            }
            out = render_frame(
                gstate,
                batch.camera,
                batch.frame,
                smpl,
                bg=bg,
                active_sh_degree=active_sh_degree,
                mlp_params=mlps,
                config=raster_config,
                means2d_offset=m2d_off,
            )
            alive_f = ts.gauss.alive.astype(jnp.float32)
            scaling_mean = jnp.sum(
                G.get_scaling(params.gaussians) * alive_f[:, None]
            ) / jnp.maximum(jnp.sum(alive_f) * 3, 1.0)
            total, metrics = compute_losses_a(out, batch, scaling_mean,
                                              lfn, lpips_crop)
            metrics["overflow_tiles"] = out.overflow_tiles
            metrics["overflow_gauss"] = out.overflow_gauss
            metrics["overflow_inst"] = out.overflow_inst
            return total, (metrics, out.radii)

        (_, (metrics, radii)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(trainable_params(ts), zeros2d)
        gparams, gm2d = grads

        frozen = ts.step >= cfg.pbr_iteration
        mask = geometry_freeze_mask(gparams, frozen)
        gparams = jax.tree_util.tree_map(lambda g, m: g * m, gparams, mask)

        params = trainable_params(ts)
        updates, opt_state = tx.update(gparams, ts.opt_state, params)
        new_params = optax.apply_updates(params, updates)

        # Densification statistics in reference NDC units.
        scale = densify_grad_scale(batch.camera.width, batch.camera.height)
        gauss = ts.gauss._replace(params=new_params.gaussians)
        gauss = G.add_densification_stats(gauss, gm2d * scale[None, :], radii)

        new_ts = TrainState(
            gauss=gauss,
            pose_refiner=new_params.pose_refiner,
            lbs_offset=new_params.lbs_offset,
            opt_state=opt_state,
            step=ts.step + 1,
        )
        return new_ts, metrics

    _step = functools.partial(jax.jit, static_argnums=(3,),
                              donate_argnums=(0,) if donate else ())(
        _step_impl)

    @functools.partial(jax.jit, static_argnums=(5,),
                       donate_argnums=(0,) if donate else ())
    def _chunk(ts: TrainState, views: TrainBatch, consts, idx: jnp.ndarray,
               n: jnp.ndarray, active_sh_degree: int):
        """Up to len(idx) iterations in ONE dispatch: a dynamic-trip
        fori_loop of the step over an index vector into the [V, ...]-stacked
        view set (device-resident — each trip gathers ONE view, no [K, ...]
        batch is ever materialized). The trip count `n` is a traced scalar,
        so every chunk length shares ONE compiled program (a lax.scan per
        distinct K would pay a full compile of the same body each). In a
        remote-dispatch environment every jitted call pays tunnel latency;
        chunking amortizes it K-fold (the measured full-train loop was
        dispatch-bound, PERF.md)."""
        mshape = jax.eval_shape(
            lambda ts, b: _step_impl(ts, b, consts, active_sh_degree)[1],
            ts, jax.tree_util.tree_map(lambda x: x[0], views))
        mbuf = jax.tree_util.tree_map(
            lambda s: jnp.zeros((idx.shape[0],) + s.shape, s.dtype), mshape)

        def body(t, carry):
            ts, mbuf = carry
            batch = jax.tree_util.tree_map(lambda x: x[idx[t]], views)
            ts, m = _step_impl(ts, batch, consts, active_sh_degree)
            mbuf = jax.tree_util.tree_map(
                lambda buf, v: buf.at[t].set(v), mbuf, m)
            return ts, mbuf

        return jax.lax.fori_loop(0, n, body, (ts, mbuf))

    def step(ts, batch, active_sh_degree: int):
        # static sh degree: at most sh_degree+1 retraces over a run
        return _step(ts, batch, consts, int(active_sh_degree))

    def chunk(ts, views, idx, active_sh_degree: int, pad_to: int = 0):
        """(ts, [V]-stacked views, [K<=pad_to] idx, deg) -> (ts, metrics
        stacked [pad_to] with only the first K rows live)."""
        n = len(idx)
        pad_to = max(pad_to, n)
        idx = list(idx) + [0] * (pad_to - n)
        ts, mseq = _chunk(ts, views, consts, jnp.asarray(idx, jnp.int32),
                          jnp.int32(n), int(active_sh_degree))
        return ts, (mseq, n)

    step.chunk = chunk
    step.jitted = _step          # exposed for AOT/introspection tooling
    step.consts = consts
    return step


def densify_event(
    ts: TrainState,
    rng: jax.Array,
    cfg: OptimizationConfig,
    extent: float,
    smpl_vertices: jnp.ndarray,
    iteration: int,
) -> TrainState:
    """One scheduled densify+prune, with Adam-moment reset at rewritten slots.

    Schedule parity (train.py:401-412): size_threshold 20 after iter 3000
    (vacuous under the 1.2k/2k budgets, kept for completeness).
    """
    max_screen = 20.0 if iteration > 3000 else 0.0
    gauss, written, info = G.densify_and_prune(
        ts.gauss,
        rng,
        max_grad=cfg.densify_grad_threshold,
        min_opacity=0.005,
        extent=extent,
        max_screen_size=max_screen,
        max_screen_size_on=iteration > 3000,
        kl_threshold=cfg.kl_threshold,
        smpl_vertices=smpl_vertices,
        use_kl=cfg.use_kl_densify,
        percent_dense=cfg.percent_dense,
    )
    opt_state = reset_adam_slots(ts.opt_state, written, ts.gauss.capacity)
    return ts._replace(gauss=gauss, opt_state=opt_state), info


def maybe_grow_capacity(
    ts: TrainState, min_free: int | None = None
) -> TrainState:
    """Double the Gaussian capacity when free slots run low (outside jit).

    Called before each densify event so clones/splits are never dropped for
    lack of slots: growth doubles every per-Gaussian leaf (params, alive,
    stats) AND the per-Gaussian Adam moment rows. Triggers a one-time re-jit
    of the train step at the new capacity.
    """
    cap = ts.gauss.capacity
    n_alive = int(ts.gauss.num_alive)
    min_free = min_free if min_free is not None else max(256, cap // 8)
    if cap - n_alive >= min_free:
        return ts
    from mygauhuman_tpu.train.optim import grow_opt_state

    new_cap = cap * 2
    return ts._replace(
        gauss=G.grow_capacity(ts.gauss, new_cap),
        opt_state=grow_opt_state(ts.opt_state, cap, new_cap),
    )


def active_sh_degree_at(step: int, max_degree: int) -> int:
    """SH degree ramps one level every 1000 iters (train.py:205-206)."""
    return min(step // 1000, max_degree)


def train_loop(
    ts: TrainState,
    tx,
    step_fn,
    batches: list[TrainBatch],
    cfg: OptimizationConfig,
    *,
    extent: float,
    smpl_vertices: jnp.ndarray,
    max_sh_degree: int = 3,
    seed: int = 0,
    num_iterations: int | None = None,
    start_iteration: int = 0,
    callback: Callable | None = None,
    scan_chunk: int = 1,
    callback_iters: tuple = (),
):
    """Host-side schedule: random view order, densify/reset events.

    View sampling parity (train.py:212-215): a shuffled stack of all train
    views, refilled when exhausted. `start_iteration` resumes mid-schedule
    (the --start_checkpoint path, reference train.py:136-138,179): densify /
    opacity-reset / SH-ramp events line up with the original run.

    scan_chunk > 1 runs up to that many iterations per dispatch via
    `step_fn.chunk` (a lax.scan over stacked views) — chunks never cross a
    densify/reset/SH-ramp boundary or an iteration in `callback_iters`, so
    the schedule is bit-identical to scan_chunk=1; only the callback cadence
    changes (invoked once per chunk, with that chunk's LAST metrics).
    """
    import numpy as np

    num_iterations = num_iterations or cfg.iterations
    host_rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    stack: list[int] = []
    metrics = {}
    chunked = scan_chunk > 1 and hasattr(step_fn, "chunk")
    cb_set = set(int(i) for i in callback_iters)
    views = None
    if chunked:
        # one [V, ...] device-resident stack of all train views: chunks
        # scan over index vectors and gather on device (no H2D per chunk,
        # no [K, ...] batch buffer). Same total bytes as the view list.
        # ONE jitted program (eager per-leaf stacks paid a tunnel round
        # trip each on remote backends)
        views = jax.jit(
            lambda bs: jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *bs)
        )(tuple(batches))

    def pick_index():
        nonlocal stack
        if not stack:
            stack = list(range(len(batches)))
        return stack.pop(host_rng.randint(len(stack)))

    def pick_batch():
        return batches[pick_index()]

    def chunk_end(it):
        """Last iteration of the chunk starting at `it`: never cross an
        event boundary (events fire AT multiples, so a chunk may END on one
        but not contain one mid-chunk), an SH-degree change, or an
        iteration the caller must observe."""
        end = min(it + scan_chunk - 1, num_iterations)
        # SH degree is static per chunk: stop before it//1000 changes
        end = min(end, (it // 1000 + 1) * 1000 - 1)
        for e in range(it, end + 1):
            is_event = (
                (cfg.densify_from_iter <= e < cfg.densify_until_iter
                 and e % cfg.densification_interval == 0)
                or e % cfg.opacity_reset_interval == 0
                or e in cb_set
            )
            if is_event:
                return e
        return end

    it = start_iteration + 1
    while it <= num_iterations:
        deg = active_sh_degree_at(it, max_sh_degree)
        if chunked:
            end = chunk_end(it)
            k = end - it + 1
        else:
            end, k = it, 1
        if not chunked:
            ts, metrics = step_fn(ts, pick_batch(), deg)
        else:
            # k == 1 also rides the chunk program (n = 1) — a separate
            # single-step executable would cost its own compile
            idx = [pick_index() for _ in range(k)]
            ts, (mseq, n) = step_fn.chunk(ts, views, idx, deg,
                                          pad_to=scan_chunk)
            metrics = jax.tree_util.tree_map(lambda x: x[n - 1], mseq)
        it = end

        # failure detection (reference has none beyond snapshot dumps,
        # SURVEY.md §5.3): a non-finite loss snapshots the blown-up state
        # for offline repro and aborts instead of training on garbage
        if (chunked or it % 50 == 0) and not np.isfinite(
            float(metrics["loss"])
        ):
            from mygauhuman_tpu.train.checkpoint import save_checkpoint

            path = save_checkpoint("output/diverged", it, ts)
            raise FloatingPointError(
                f"non-finite loss at iteration {it}; state snapshot at "
                f"{path} (the snapshot_fw.dump equivalent)"
            )

        if (
            cfg.densify_from_iter <= it < cfg.densify_until_iter
            and it % cfg.densification_interval == 0
        ):
            ts = maybe_grow_capacity(ts)
            key, sub = jax.random.split(key)
            ts, dinfo = densify_event(ts, sub, cfg, extent, smpl_vertices, it)
            # truncation/health counters, surfaced every densify event
            # (never silent — VERDICT r1 weak #3/#6)
            metrics = dict(metrics)
            metrics.update(
                {f"densify_{k}": int(v) for k, v in dinfo.items()}
            )
            metrics["capacity"] = ts.gauss.capacity
        if it % cfg.opacity_reset_interval == 0:
            from mygauhuman_tpu.train.optim import reset_opacity_moments

            ts = ts._replace(
                gauss=G.reset_opacity(ts.gauss),
                opt_state=reset_opacity_moments(ts.opt_state),
            )
        if callback is not None:
            callback(it, ts, metrics)
        it += 1
    return ts, metrics
