"""Training CLI — the reference `train.py` driver re-built on the JAX stack.

Usage:
  python -m mygauhuman_tpu.cli.train --source_path data/zju_mocap_refine/my_377 \\
      --exp_name zju_377 --iterations 1200 --motion_offset_flag --smpl_type smpl
  python -m mygauhuman_tpu.cli.train --synthetic       # no-dataset demo run

Flow parity (train.py:128-434): scene load -> Gaussian init from the SMPL
cloud -> loss-branch-A optimization with densify/prune/opacity-reset
schedules and SH-degree ramp -> periodic eval (PSNR/SSIM/LPIPS) + eval-cache
capture -> orbax checkpoint + PLY export. The PBR phase (branch B) engages
past `pbr_iteration` with occlusion baking.
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="mygauhuman_tpu trainer")
    p.add_argument("--source_path", "-s", type=str, default="")
    p.add_argument("--model_path", "-m", type=str, default="")
    p.add_argument("--exp_name", type=str, default="default")
    p.add_argument("--smpl_model_path", type=str,
                   default="assets/SMPL_NEUTRAL_renderpeople.pkl")
    p.add_argument("--smpl_type", type=str, default="smpl")
    p.add_argument("--white_background", action="store_true")
    p.add_argument("--motion_offset_flag", action="store_true", default=True)
    p.add_argument("--eval", action="store_true", default=True)
    p.add_argument("--iterations", type=int, default=1200)
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--test_iterations", type=int, nargs="+", default=[1200])
    p.add_argument("--save_iterations", type=int, nargs="+", default=[1200])
    p.add_argument("--pbr_iteration", type=int, default=30_000)
    p.add_argument("--use_kl_densify", action="store_true")
    # densify schedule (reference OptimizationParams,
    # arguments/__init__.py:91-96)
    p.add_argument("--densification_interval", type=int, default=100)
    p.add_argument("--densify_from_iter", type=int, default=400)
    p.add_argument("--densify_until_iter", type=int, default=2000)
    p.add_argument("--densify_grad_threshold", type=float, default=2e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--start_checkpoint", type=str, default="",
                   help="resume from <dir>/chkpnt<iter> "
                        "(reference --start_checkpoint, train.py:136-138)")
    p.add_argument("--lpips_weights", type=str, default="",
                   help=".npz VGG16+lin weights for LPIPS; without it a "
                        "deterministic random backbone is used")
    p.add_argument("--disable_lpips", action="store_true",
                   help="drop the 0.01*lpips training term and eval metric")
    p.add_argument("--gui", action="store_true",
                   help="serve the SIBR live-viewer protocol while training")
    p.add_argument("--gui_host", type=str, default="127.0.0.1")
    p.add_argument("--gui_port", type=int, default=6009)
    p.add_argument("--skip_galleries", action="store_true",
                   help="do not save eval render galleries at test iters")
    p.add_argument("--synthetic", action="store_true",
                   help="train on the built-in synthetic scene (no dataset)")
    p.add_argument("--synthetic_size", type=int, default=128)
    p.add_argument("--synthetic_verts", type=int, default=400,
                   help="synthetic-scene Gaussian count (6890 = the ZJU "
                        "SMPL-vertex-cloud scale)")
    p.add_argument("--synthetic_views", type=int, default=4)
    p.add_argument("--capacity", type=int, default=0,
                   help="initial Gaussian capacity (0 = auto). Pre-sizing "
                        "for the expected post-densification count avoids "
                        "mid-run capacity-growth re-jits")
    p.add_argument("--use_pallas", action="store_true", default=None)
    p.add_argument("--scan_chunk", type=int, default=100,
                   help="iterations fused per dispatch (lax.scan over "
                        "stacked views); 1 disables. Chunks never cross "
                        "densify/reset/SH/test/save boundaries, so the "
                        "schedule is identical — only callback cadence "
                        "changes. Forced to 1 with --gui (interactivity)")
    p.add_argument("--multichip", action="store_true",
                   help="train with the tile-sharded SPMD step over a "
                        "(data, gauss, tiles) hybrid mesh spanning all "
                        "attached devices")
    p.add_argument("--bake_cells", type=int, default=128,
                   help="occlusion-bake per-SWEEP voxel window (PBR phase): "
                        "all occupied 10^3-grid cells are baked by default "
                        "(reference parity) in windows of this size; only "
                        "sizes the per-dispatch work, not coverage")
    p.add_argument("--bake_single_sweep", action="store_true",
                   help="restore the round-4 single-sweep bake: only the "
                        "first --bake_cells occupied cells are baked; "
                        "Gaussians beyond get full visibility, counted in "
                        "bake_out_of_budget")
    p.add_argument("--occ_budget_mb", type=float, default=1024.0,
                   help="device-memory budget for the chunked PBR loop's "
                        "baked-occlusion slot buffer (uint8 maps); chunks "
                        "needing more distinct cameras are split")
    p.add_argument("--exchange_capacity", type=int, default=16384,
                   help="per-(shard, strip) instance window of the "
                        "multichip all_to_all exchange")
    p.add_argument("--precompile", action="store_true",
                   help="compile every program the budgeted run needs "
                        "(chunk executables per SH degree, densify, eval, "
                        "at every capacity of the densify doubling ladder) "
                        "into the persistent XLA cache, then exit without "
                        "training — run once on a fresh machine so the "
                        "real run starts warm (PERF.md cold-start wall)")
    p.add_argument("--precompile_max_cap", type=int, default=65536,
                   help="top of the capacity ladder --precompile warms "
                        "for an auto-capacity run (ignored when "
                        "--capacity pins the capacity)")
    return p


def _load_body_model(smpl_type: str, model_path: str, source_path: str):
    """--smpl_type dispatch (reference arguments/__init__.py smpl_type +
    scene dispatch): 'smplx' (or an .smc source) loads the 55-joint SMPL-X
    into the common SMPLModel pytree; everything downstream (pose-refiner
    width, LBS, densify) is total_bones-generic."""
    if smpl_type == "smplx" or source_path.endswith(".smc") \
            or "dna_rendering" in source_path.lower():
        from mygauhuman_tpu.models.smplx import load_smplx

        return load_smplx(model_path)
    from mygauhuman_tpu.models.smpl import load_smpl

    return load_smpl(model_path)


def main(argv=None) -> dict:
    import jax
    import jax.numpy as jnp

    from mygauhuman_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    args = build_parser().parse_args(argv)

    from mygauhuman_tpu.config import Config, OptimizationConfig
    from mygauhuman_tpu.models import gaussians as G
    from mygauhuman_tpu.models.io import save_ply
    from mygauhuman_tpu.models.mlps import init_lbs_offset, init_pose_refiner
    from mygauhuman_tpu.ops.rasterize import RasterizerConfig
    from mygauhuman_tpu.render import render_frame
    from mygauhuman_tpu.train.checkpoint import (
        save_checkpoint,
        save_eval_cache,
    )
    from mygauhuman_tpu.train.trainer import (
        create_train_state,
        make_train_step,
        train_loop,
    )
    from mygauhuman_tpu.utils.logging import MetricLogger
    from mygauhuman_tpu.train.losses import psnr as psnr_fn

    out_dir = args.model_path or os.path.join("output", args.exp_name)
    os.makedirs(out_dir, exist_ok=True)

    cfg = OptimizationConfig(
        iterations=args.iterations,
        pbr_iteration=args.pbr_iteration,
        use_kl_densify=args.use_kl_densify,
        densification_interval=args.densification_interval,
        densify_from_iter=args.densify_from_iter,
        densify_until_iter=args.densify_until_iter,
        densify_grad_threshold=args.densify_grad_threshold,
    )
    use_pallas = (
        args.use_pallas
        if args.use_pallas is not None
        else jax.devices()[0].platform not in ("cpu",)
    )

    if args.synthetic:
        from mygauhuman_tpu.data.synthetic import make_synthetic_scene

        cap = args.capacity or 1024
        while cap < 2 * args.synthetic_verts:
            cap *= 2
        scene = make_synthetic_scene(
            n_views=args.synthetic_views,
            width=args.synthetic_size, height=args.synthetic_size,
            n_verts=args.synthetic_verts, capacity=cap,
            # 4*cap instance slots: real frames peak at ~4 instances per
            # alive Gaussian (measured ~170k at 43k alive); the backward's
            # per-gaussian scatter-add scales with this cap (-4.4 ms/step at
            # 64k capacity vs 8*cap). Truncation is counted (overflow_inst).
            raster_config=RasterizerConfig(use_pallas=use_pallas,
                                           instance_capacity=4 * cap),
        )
        smpl_model = scene.smpl_model
        train_batches = scene.batches
        test_batches = scene.batches[:1]
        state = scene.init_state
        extent = scene.extent
        smpl_vertices = scene.big_pose_verts
        raster_cfg = scene.raster_config
        test_pose_ids = list(range(len(test_batches)))
    else:
        from mygauhuman_tpu.data.readers import (
            camera_info_to_batch,
            load_scene_info,
            zju_normal_reencode,
        )

        smpl_model = _load_body_model(args.smpl_type, args.smpl_model_path,
                                      args.source_path)
        info = load_scene_info(
            args.source_path, args.white_background, args.exp_name,
            args.eval, smpl_model,
        )
        is_zju = "zju" in args.source_path.lower()

        def to_batch(ci):
            b = camera_info_to_batch(ci)
            if is_zju and ci.normal is not None:
                b = b._replace(
                    gt_normal=jnp.asarray(zju_normal_reencode(ci.normal))
                )
            return b

        train_batches = [to_batch(c) for c in info.train_cameras]
        test_batches = [to_batch(c) for c in info.test_cameras]
        test_pose_ids = [c.pose_id for c in info.test_cameras]
        pcd = info.point_cloud
        state = G.create_from_pcd(
            pcd.points, pcd.colors, pcd.normals, sh_degree=args.sh_degree,
            capacity=args.capacity or None,
        )
        extent = info.nerf_normalization["radius"]
        smpl_vertices = jnp.asarray(
            info.train_cameras[0].big_pose_world_vertex
        )
        # Same instance-list sizing as the synthetic branch: 4 slots per
        # capacity slot (real frames peak ~4 instances per alive Gaussian);
        # without a cap the sort/gather/backward pay the N*S worst case.
        raster_cfg = RasterizerConfig(
            use_pallas=use_pallas,
            instance_capacity=4 * state.capacity,
        )

    key = jax.random.PRNGKey(args.seed)
    n_joints = smpl_model.j_regressor.shape[0]
    ts, tx = create_train_state(
        cfg, state,
        init_pose_refiner(key, total_bones=n_joints),
        init_lbs_offset(jax.random.PRNGKey(args.seed + 1),
                        total_bones=n_joints),
    )

    # --start_checkpoint resume (reference train.py:136-138 ->
    # gaussians.restore): shape-tolerant restore into the fresh state, then
    # continue the iteration schedule where the checkpoint left off.
    start_iteration = 0
    if args.start_checkpoint:
        from mygauhuman_tpu.train.checkpoint import restore_checkpoint_like

        ckpt_dir, base = os.path.split(args.start_checkpoint.rstrip("/"))
        if not base.startswith("chkpnt"):
            raise ValueError(
                f"--start_checkpoint must point at <dir>/chkpnt<iter>, "
                f"got {args.start_checkpoint}")
        start_iteration = int(base[len("chkpnt"):])
        ts = restore_checkpoint_like(ckpt_dir, start_iteration, ts)
        print(f"resumed from {args.start_checkpoint} "
              f"(iteration {start_iteration})")

    # LPIPS: active by default, both in the 0.01*lpips training term
    # (train.py:287) and the eval report (train.py:539). Without a weights
    # file the backbone is a deterministic random VGG (no egress in this
    # environment); --lpips_weights restores published-number parity.
    lpips_obj = None
    if not args.disable_lpips:
        from mygauhuman_tpu.eval.lpips import LPIPS

        lpips_obj = LPIPS(weights_file=args.lpips_weights or None)

    bg = jnp.ones(3) if args.white_background else jnp.zeros(3)
    if args.multichip and len(jax.devices()) > 1:
        # tile-sharded SPMD step over every attached device
        # (parallel/raster.py); train_loop feeds one view per iteration,
        # stacked to the step's [B=1, ...] batch convention
        from mygauhuman_tpu.parallel.mesh import (
            init_distributed,
            make_hybrid_mesh,
        )
        from mygauhuman_tpu.parallel.train import (
            make_tile_sharded_train_step,
            stack_batches,
        )

        init_distributed()
        mesh = make_hybrid_mesh()
        print(f"multichip mesh: {dict(mesh.shape)}")
        if jax.devices()[0].platform == "cpu":
            # the sharded path always runs the Pallas kernel — interpret it
            # on CPU (virtual-mesh validation runs)
            raster_cfg = raster_cfg._replace(pallas_interpret=True)
        from mygauhuman_tpu.train.trainer import scene_lpips_crop

        base_step = make_tile_sharded_train_step(
            smpl_model, tx, cfg, raster_cfg, bg=bg, mesh=mesh,
            exchange_capacity=args.exchange_capacity, lpips_fn=lpips_obj,
            lpips_crop=scene_lpips_crop(
                [np.asarray(b.bound_mask) for b in train_batches]),
        )

        def step_fn(ts, batch, deg):
            return base_step(ts, stack_batches([batch]), deg)
    else:
        # static LPIPS window sized to the SCENE's max subject bbox (the
        # VGG cost scales with window area; 384 -> 320 at ZJU scale is
        # ~4 ms/step)
        from mygauhuman_tpu.train.trainer import scene_lpips_crop

        lpips_crop = scene_lpips_crop(
            [np.asarray(b.bound_mask) for b in train_batches])
        step_fn = make_train_step(smpl_model, tx, cfg, raster_cfg, bg=bg,
                                  lpips_fn=lpips_obj, donate=True,
                                  lpips_crop=lpips_crop)
    logger = MetricLogger(out_dir)

    gui = None
    if args.gui:
        from mygauhuman_tpu.utils.network_gui import NetworkGUI

        gui = NetworkGUI(args.gui_host, args.gui_port)

    eval_cache: dict = {}

    # jitted eval render + metric bundle: render_frame is a plain jnp
    # composition, and an unjitted call pays per-op dispatch latency (the
    # remote-device tunnel makes that seconds per image). The SMPL tensors
    # and LPIPS weights ride as ARGUMENTS (closed-over arrays embed as
    # dense literals in the executable — 100+ MB cache loads, PERF.md)
    import functools

    _smpl_consts = {
        "v_template": smpl_model.v_template,
        "shapedirs": smpl_model.shapedirs,
        "posedirs": smpl_model.posedirs,
        "j_regressor": smpl_model.j_regressor,
        "weights": smpl_model.weights,
    }

    @functools.partial(jax.jit, static_argnums=(5,))
    def _eval_render_impl(gauss, camera, frame, mlps, smpl_c, deg):
        out = render_frame(
            gauss, camera, frame, smpl_model._replace(**smpl_c), bg=bg,
            active_sh_degree=deg, mlp_params=mlps, config=raster_cfg,
        )
        return out

    def _eval_render(gauss, camera, frame, mlps, deg):
        return _eval_render_impl(gauss, camera, frame, mlps,
                                 _smpl_consts, deg)

    @jax.jit
    def _eval_metrics_impl(render, gt, lpips_params):
        from mygauhuman_tpu.eval.lpips import lpips_distance
        from mygauhuman_tpu.train.losses import l1_loss, ssim as ssim_fn

        m = {
            "l1": l1_loss(render, gt),
            "psnr": psnr_fn(render, gt),
            "ssim": ssim_fn(render, gt),
        }
        if lpips_params is not None:
            # key is "lpips_rand" for the random-VGG fallback (honesty:
            # not comparable to published LPIPS without pretrained weights)
            m[lpips_obj.metric_name] = lpips_distance(
                lpips_params, render, gt)
        return m

    def _eval_metrics(render, gt):
        return _eval_metrics_impl(
            render, gt, lpips_obj.params if lpips_obj is not None else None)

    def run_eval(it, ts):
        """Test-iteration report parity (train.py:458-556): L1/PSNR/SSIM/
        LPIPS on the test split + a train sample, render galleries, and the
        per-pose LBS replay cache."""
        import imageio.v2 as imageio

        splits = {
            "test": list(zip(test_pose_ids, test_batches)),
            "train": list(enumerate(train_batches[:4])),
        }
        test_psnr = 0.0
        # Alive mask fetched ONCE per eval, not per view: the state does not
        # change inside run_eval, and a per-view device_get costs a full
        # remote-tunnel round trip each (seconds over 17+ test views).
        alive_idx = np.nonzero(
            np.asarray(jax.device_get(ts.gauss.alive)))[0]
        for split, items in splits.items():
            if not items:
                continue
            rows: dict = {}
            gdir = os.path.join(out_dir, f"eval_{it}", split)
            if not args.skip_galleries:
                os.makedirs(gdir, exist_ok=True)
            for pose_id, batch in items:
                out = _eval_render(
                    ts.gauss, batch.camera, batch.frame,
                    {"pose_refiner": ts.pose_refiner,
                     "lbs_offset": ts.lbs_offset},
                    min(it // 1000, args.sh_degree),
                )
                m = jax.device_get(
                    _eval_metrics(out.render, batch.gt_image))
                for k, v in m.items():
                    rows.setdefault(k, []).append(float(v))
                if split == "test":
                    # keyed by pose_id (reference keys smpl_rot by pose,
                    # train.py:548-552) so replay survives reordering.
                    # Rows are gathered into ALIVE-compacted order — the
                    # same order save_ply writes — so the replay stays
                    # aligned with a load_ply/compact_state'd state even
                    # when pruning left holes in the slot space.
                    eval_cache[str(pose_id)] = {
                        "transforms": np.asarray(out.transforms)[alive_idx],
                        "translation": np.asarray(out.translation)[alive_idx],
                    }
                if not args.skip_galleries:
                    pair = np.concatenate(
                        [np.asarray(out.render), np.asarray(batch.gt_image)],
                        axis=1,
                    )
                    imageio.imwrite(
                        os.path.join(gdir, f"{pose_id:03d}.png"),
                        (np.clip(pair, 0, 1) * 255).astype(np.uint8),
                    )
                    # TB image grids (train.py:458-556 parity; no-op
                    # without tensorboard)
                    logger.log_image(it, f"{split}/render_{pose_id}", pair)
            means = {k: float(np.mean(v)) for k, v in rows.items() if v}
            logger.log(it, means, prefix=split)
            print(f"[iter {it}] {split}: " + "  ".join(
                f"{k} {v:.4f}" for k, v in means.items()
            ) + f"  ({int(ts.gauss.num_alive)} gaussians)")
            if split == "test":
                test_psnr = means["psnr"]
        return test_psnr

    scan_chunk = 1 if args.gui else max(1, args.scan_chunk)

    if args.precompile:
        # Cold-start mitigation (the cold wall is 4-7x the warm wall,
        # PERF.md): drive every jitted program of the budgeted run through
        # compilation — each lands in the persistent cache — then exit.
        # Chunk executables are compiled with ZERO-trip dispatches (the
        # trip count is traced, so the n=0 call builds the same
        # executable the real run uses); densify/eval run once on
        # throwaway copies. The step/densify/eval programs RETRACE PER
        # CAPACITY and an auto-capacity run doubles capacity during
        # densification (8k->16k->32k->64k on the ZJU budget) — a
        # single-capacity warmup missed ~145 s of in-loop compiles
        # (measured, PERF.md cold-start section) — so the warmer walks
        # the same doubling ladder up to --precompile_max_cap. An
        # explicit --capacity run has no growth: the ladder collapses to
        # that one capacity.
        t0 = time.time()
        from mygauhuman_tpu.models import gaussians as G
        from mygauhuman_tpu.train.optim import grow_opt_state
        from mygauhuman_tpu.train.trainer import (
            active_sh_degree_at,
            densify_event,
        )

        phase_a = min(cfg.iterations, cfg.pbr_iteration)
        degs = sorted({active_sh_degree_at(it, args.sh_degree)
                       for it in range(1, phase_a + 1)})
        eval_degs = sorted({active_sh_degree_at(it, args.sh_degree)
                            for it in args.test_iterations
                            if it <= cfg.iterations}) or [degs[-1]]
        want_densify = (phase_a >= cfg.densify_from_iter
                        and cfg.densify_until_iter > cfg.densify_from_iter)
        caps = [ts.gauss.capacity]
        if not args.capacity:        # auto-capacity: mid-run doubling
            while caps[-1] < max(args.precompile_max_cap, caps[0]):
                caps.append(caps[-1] * 2)
        views_w = None
        if scan_chunk > 1 and hasattr(step_fn, "chunk"):
            views_w = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *train_batches)
        b0 = test_batches[0]
        ts_w = ts
        for ci, cap in enumerate(caps):
            tc = time.time()
            if cap != ts_w.gauss.capacity:
                ts_w = ts_w._replace(
                    gauss=G.grow_capacity(ts_w.gauss, cap),
                    opt_state=grow_opt_state(
                        ts_w.opt_state, ts_w.gauss.capacity, cap),
                )
            if views_w is not None:
                for deg in degs:
                    ts_w, _ = step_fn.chunk(ts_w, views_w, [], deg,
                                            pad_to=scan_chunk)
            else:
                for deg in degs:
                    ts_w, _ = step_fn(ts_w, train_batches[0], deg)
            if want_densify:
                densify_event(
                    jax.tree_util.tree_map(jnp.copy, ts_w),
                    jax.random.PRNGKey(0), cfg, extent, smpl_vertices,
                    cfg.densify_from_iter,
                )
            for deg in eval_degs:
                out_w = _eval_render(
                    ts_w.gauss, b0.camera, b0.frame,
                    {"pose_refiner": ts_w.pose_refiner,
                     "lbs_offset": ts_w.lbs_offset},
                    deg,
                )
            _eval_metrics(out_w.render, b0.gt_image)
            jax.block_until_ready(out_w.render)
            print(f"precompile: capacity {cap} "
                  f"({len(degs)} chunk + {int(want_densify)} densify + "
                  f"{len(eval_degs)} eval programs) "
                  f"in {time.time() - tc:.1f}s", flush=True)
        elapsed = time.time() - t0
        print(f"precompile: {len(caps)} capacit{'ies' if len(caps) > 1 else 'y'} "
              f"{caps} in {elapsed:.1f}s total — cache is warm, re-run "
              f"without --precompile to train")
        logger.close()
        if gui is not None:
            gui.close()
        return {"elapsed_s": elapsed, "precompiled": True,
                "final_loss": 0.0, "test_psnr": 0.0, "out_dir": out_dir}

    start = time.time()
    last_psnr = 0.0

    def poll_gui(it, ts):
        """train.py:180-193: answer viewer frames between iterations."""
        if gui is None or not gui.try_connect():
            return
        from mygauhuman_tpu.data.camera import Camera

        try:
            while True:
                cam, _, keep_alive, scaling_mod = gui.receive()
                img = None
                if cam is not None:
                    import math

                    w2c = np.asarray(cam.w2c, np.float32)
                    c2w = np.linalg.inv(w2c.astype(np.float64))
                    jcam = Camera(
                        w2c=jnp.asarray(w2c),
                        full_proj=jnp.asarray(cam.full_proj),
                        cam_center=jnp.asarray(
                            c2w[:3, 3].astype(np.float32)),
                        tan_fovx=math.tan(cam.fovx / 2),
                        tan_fovy=math.tan(cam.fovy / 2),
                        width=cam.width, height=cam.height,
                    )
                    out = render_frame(
                        ts.gauss, jcam, train_batches[0].frame, smpl_model,
                        bg=bg, active_sh_degree=min(it // 1000,
                                                    args.sh_degree),
                        mlp_params={"pose_refiner": ts.pose_refiner,
                                    "lbs_offset": ts.lbs_offset},
                        config=raster_cfg,
                        scaling_modifier=scaling_mod,
                    )
                    img = np.asarray(out.render)
                gui.send_image(img, out_dir)
                if not keep_alive:
                    break
        except (ConnectionError, OSError):
            gui.drop_connection()

    def callback(it, ts, metrics):
        nonlocal last_psnr
        if it % 100 == 0 or it == 1:
            logger.log(it, metrics)
            logger.log(it, {"n_gaussians": int(ts.gauss.num_alive)},
                       prefix="scene")
        poll_gui(it, ts)
        if it in args.test_iterations:
            last_psnr = run_eval(it, ts)
        if it in args.save_iterations:
            save_checkpoint(out_dir, it, ts, Config(optim=cfg))
            save_ply(ts.gauss, os.path.join(out_dir, f"point_cloud_{it}.ply"))
            save_eval_cache(os.path.join(out_dir, f"smpl_rot_{it}.npz"),
                            eval_cache)

    phase_a_iters = min(cfg.iterations, cfg.pbr_iteration)
    ts, metrics = train_loop(
        ts, tx, step_fn, train_batches, cfg,
        extent=extent, smpl_vertices=smpl_vertices,
        max_sh_degree=args.sh_degree, seed=args.seed, callback=callback,
        num_iterations=phase_a_iters,
        start_iteration=min(start_iteration, phase_a_iters),
        scan_chunk=scan_chunk,
        callback_iters=tuple(sorted(set(args.test_iterations)
                                    | set(args.save_iterations))),
    )

    if cfg.iterations > cfg.pbr_iteration:
        # PBR phase (branch B): bake occlusion per camera, optimize
        # materials + cubemap light (train.py:294-363)
        from mygauhuman_tpu.train.pbr import (
            create_pbr_state,
            make_pbr_train_step,
            train_loop_pbr,
        )

        pbr_state, light_tx = create_pbr_state(cfg)
        if args.multichip and len(jax.devices()) > 1:
            # phase B under the SAME mesh as phase A (sharded G-buffer
            # raster + replicated light, parallel/train.py). The bake
            # stays a replicated per-camera program inside train_loop_pbr.
            from mygauhuman_tpu.parallel.train import (
                make_tile_sharded_pbr_step,
            )

            base_pbr = make_tile_sharded_pbr_step(
                smpl_model, tx, light_tx, cfg, raster_cfg, bg=bg,
                mesh=mesh, exchange_capacity=args.exchange_capacity,
                lpips_fn=lpips_obj,
            )

            def pbr_step(ts2, pbr2, batch, knn3, occ_col, pw, deg):
                return base_pbr(ts2, pbr2, stack_batches([batch]), knn3,
                                occ_col[None], pw, deg)
        else:
            pbr_step = make_pbr_train_step(
                smpl_model, tx, light_tx, cfg, raster_cfg, bg=bg,
                lpips_fn=lpips_obj,
            )

        def pbr_callback(it, ts2, pbr2, m):
            nonlocal last_psnr
            # the loop replays per-iteration metrics in chunked mode too;
            # log on the phase-A cadence
            if it % 100 == 0 or it == 1:
                logger.log(it, m, prefix="pbr")
            if it in args.test_iterations:
                last_psnr = run_eval(it, ts2)
            if it in args.save_iterations:
                save_checkpoint(out_dir, it, (ts2, pbr2), Config(optim=cfg))
                save_ply(ts2.gauss,
                         os.path.join(out_dir, f"point_cloud_{it}.ply"))
                save_eval_cache(
                    os.path.join(out_dir, f"smpl_rot_{it}.npz"), eval_cache)
                # persist the optimized light for --relight-free PBR renders
                from mygauhuman_tpu.pbr.light import export_envmap

                np.save(os.path.join(out_dir, f"envmap_{it}.npy"),
                        np.asarray(export_envmap(pbr2.light, 64, 128)))

        ts, pbr_state, metrics = train_loop_pbr(
            ts, pbr_state, pbr_step, train_batches, smpl_model, cfg,
            start_iteration=phase_a_iters,
            num_iterations=cfg.iterations - phase_a_iters,
            max_sh_degree=args.sh_degree, seed=args.seed,
            callback=pbr_callback,
            bake_max_cells=args.bake_cells,
            bake_full_coverage=not args.bake_single_sweep,
            occ_budget_mb=args.occ_budget_mb,
            scan_chunk=scan_chunk,
            callback_iters=tuple(sorted(set(args.test_iterations)
                                        | set(args.save_iterations))),
        )
    elapsed = time.time() - start
    print(f"training done: {cfg.iterations} iters in {elapsed:.1f}s "
          f"({int(ts.gauss.num_alive)} gaussians)")
    if gui is not None:
        gui.close()
    logger.close()
    return {"elapsed_s": elapsed,
            "final_loss": float(metrics.get("loss", 0.0)),
            "test_psnr": last_psnr, "out_dir": out_dir}


if __name__ == "__main__":
    main()
