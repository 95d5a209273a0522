"""Sharded batched train step: data-parallel views x gauss-sharded scene.

jit-of-sharded-arrays (GSPMD) version of train/trainer.py's step: a batch of
B views is vmapped (sharded over the mesh "data" axis), every per-Gaussian
array is sharded over "gauss", and XLA inserts the collectives — psum of the
loss/grads over "data", all-gather / reduce-scatter around the tile exchange
inside the rasterizer. Gradients and densify statistics equal the sum of B
sequential reference iterations on one view each (modulo Adam seeing one
fused update instead of B).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from mygauhuman_tpu.config import OptimizationConfig
from mygauhuman_tpu.models import gaussians as G
from mygauhuman_tpu.models.smpl import SMPLModel
from mygauhuman_tpu.ops.rasterize import RasterizerConfig, densify_grad_scale
from mygauhuman_tpu.render import render_frame
from mygauhuman_tpu.train.trainer import (
    TrainBatch,
    TrainState,
    compute_losses_a,
    trainable_params,
)
from mygauhuman_tpu.train.optim import TrainableParams, geometry_freeze_mask


def make_batched_train_step(
    smpl_model: SMPLModel,
    tx: optax.GradientTransformation,
    cfg: OptimizationConfig,
    raster_config: RasterizerConfig,
    bg: jnp.ndarray,
):
    """Train step over a batch of views (leading axis B on every TrainBatch
    leaf). Use with jit(in_shardings=...) from parallel/mesh.py.

    SMPL tensors ride the jit boundary as arguments (closed-over arrays
    embed as executable constants — see make_train_step)."""
    smpl_consts = {
        "v_template": smpl_model.v_template,
        "shapedirs": smpl_model.shapedirs,
        "posedirs": smpl_model.posedirs,
        "j_regressor": smpl_model.j_regressor,
        "weights": smpl_model.weights,
    }

    def single_view_loss(params: TrainableParams, gauss_aux, smpl,
                         batch: TrainBatch, m2d_off, active_sh_degree: int):
        gstate = G.GaussianState(
            params=params.gaussians,
            alive=gauss_aux["alive"],
            smpl_normal=gauss_aux["smpl_normal"],
            xyz_grad_accum=gauss_aux["xyz_grad_accum"],
            denom=gauss_aux["denom"],
            max_radii2d=gauss_aux["max_radii2d"],
        )
        mlps = {
            "pose_refiner": params.pose_refiner,
            "lbs_offset": params.lbs_offset,
        }
        out = render_frame(
            gstate, batch.camera, batch.frame,
            smpl_model._replace(**smpl),
            bg=bg, active_sh_degree=active_sh_degree, mlp_params=mlps,
            config=raster_config, means2d_offset=m2d_off,
        )
        alive_f = gauss_aux["alive"].astype(jnp.float32)
        scaling_mean = jnp.sum(
            G.get_scaling(params.gaussians) * alive_f[:, None]
        ) / jnp.maximum(jnp.sum(alive_f) * 3, 1.0)
        total, metrics = compute_losses_a(out, batch, scaling_mean)
        return total, (metrics, out.radii)

    @functools.partial(jax.jit, static_argnums=(3,))
    def _step(ts: TrainState, batch: TrainBatch, smpl,
              active_sh_degree: int):
        cap = ts.gauss.capacity
        B = batch.gt_image.shape[0]
        zeros2d = jnp.zeros((B, cap, 2), jnp.float32)
        gauss_aux = {
            "alive": ts.gauss.alive,
            "smpl_normal": ts.gauss.smpl_normal,
            "xyz_grad_accum": ts.gauss.xyz_grad_accum,
            "denom": ts.gauss.denom,
            "max_radii2d": ts.gauss.max_radii2d,
        }

        def batched_loss(params, m2d_off):
            totals, (metrics, radii) = jax.vmap(
                single_view_loss, in_axes=(None, None, None, 0, 0, None)
            )(params, gauss_aux, smpl, batch, m2d_off, active_sh_degree)
            return jnp.mean(totals), (metrics, radii)

        (_, (metrics, radii)), grads = jax.value_and_grad(
            batched_loss, argnums=(0, 1), has_aux=True
        )(trainable_params(ts), zeros2d)
        gparams, gm2d = grads

        frozen = ts.step >= cfg.pbr_iteration
        mask = geometry_freeze_mask(gparams, frozen)
        gparams = jax.tree_util.tree_map(lambda g, m: g * m, gparams, mask)

        params = trainable_params(ts)
        updates, opt_state = tx.update(gparams, ts.opt_state, params)
        new_params = optax.apply_updates(params, updates)

        # Densify stats: sum of per-view contributions (== B reference
        # iterations). gm2d is d(mean loss)/d offset = per-view grad / B, so
        # scale by B to recover per-view magnitudes.
        scale = densify_grad_scale(batch.camera.width, batch.camera.height)
        per_view_norm = jnp.linalg.norm(gm2d * scale[None, None, :] * B, axis=-1)
        visible = radii > 0                                   # [B, cap]
        gauss = ts.gauss._replace(params=new_params.gaussians)
        gauss = gauss._replace(
            xyz_grad_accum=gauss.xyz_grad_accum
            + jnp.sum(jnp.where(visible, per_view_norm, 0.0), axis=0),
            denom=gauss.denom + jnp.sum(visible.astype(jnp.float32), axis=0),
            max_radii2d=jnp.where(
                jnp.any(visible, axis=0),
                jnp.maximum(gauss.max_radii2d,
                            jnp.max(radii, axis=0).astype(jnp.float32)),
                gauss.max_radii2d,
            ),
        )

        new_ts = TrainState(
            gauss=gauss,
            pose_refiner=new_params.pose_refiner,
            lbs_offset=new_params.lbs_offset,
            opt_state=opt_state,
            step=ts.step + 1,
        )
        mean_metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        return new_ts, mean_metrics

    def step(ts: TrainState, batch: TrainBatch, active_sh_degree: int):
        return _step(ts, batch, smpl_consts, int(active_sh_degree))

    return step


def stack_batches(batches: list[TrainBatch]) -> TrainBatch:
    """Stack single-view TrainBatches into one batched TrainBatch."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)


# ----------------------------------------------------------------------------
# Fully-SPMD train step over the ("data", "gauss", "tiles") mesh.
#
# Unlike make_batched_train_step (GSPMD annotations; XLA chooses the
# collectives and in practice replicates the blend), this is the explicit
# shard_map program: the rasterizer's tile-strip exchange (parallel/raster.py)
# runs the Pallas kernel per strip, views shard over "data", per-Gaussian
# state shards over ("gauss", "tiles"), and the gradient collectives are
# placed by the AD transposes of all_to_all / all_gather plus explicit psums.
# ----------------------------------------------------------------------------


def _ts_specs(ts: TrainState, spec_g, repl):
    """PartitionSpecs for a TrainState: per-Gaussian (capacity-leading)
    leaves shard over the raster axes, everything else replicates.
    Path-matched: MLP layers of width == capacity must NOT be sharded over
    the raster axes (the body would silently use a local slice of a
    replicated-semantics matrix)."""
    from mygauhuman_tpu.train.optim import is_gaussian_path

    cap = ts.gauss.capacity

    def spec(path, leaf):
        if (hasattr(leaf, "shape") and leaf.ndim >= 1
                and leaf.shape[0] == cap and is_gaussian_path(path)):
            return spec_g
        return repl

    return jax.tree_util.tree_map_with_path(spec, ts)


def _batch_specs(batch: TrainBatch, spec_d, repl):
    def spec(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1:
            return spec_d
        return repl

    return jax.tree_util.tree_map(spec, batch)


def _place(tree, specs, mesh):
    """device_put a pytree onto its NamedShardings BEFORE the jitted step
    sees it: without this the first call (host-committed arrays) and every
    later call (mesh-sharded outputs) carry different input shardings and
    the step compiles TWICE (PERF.md round-4 sharded-path note). Already-
    correctly-placed arrays are a no-op."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(tree, shardings)


def make_tile_sharded_train_step(
    smpl_model: SMPLModel,
    tx: optax.GradientTransformation,
    cfg: OptimizationConfig,
    raster_config: RasterizerConfig,
    bg: jnp.ndarray,
    mesh,
    raster_axes: tuple = ("gauss", "tiles"),
    data_axis: str = "data",
    exchange_capacity: int = 4096,
    lpips_fn=None,
    lpips_crop: int | None = None,
):
    """Returns step(ts, batch, active_sh_degree) where every per-Gaussian
    leaf of `ts` is sharded over raster_axes and every batch leaf over
    data_axis. Losses/gradients match the single-device step (fp tolerance):
    the replicated loss is scaled by 1/n_shards before AD (each shard
    carries its own loss copy through the all_gather transpose), replicated
    MLP grads are psum'd over every axis, and densify statistics psum over
    the data axis only (per-Gaussian stats live on the owning shard)."""
    import functools

    import numpy as np
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from mygauhuman_tpu.parallel.raster import (
        make_strip_raster_fn,
        mesh_shard_count,
    )
    from mygauhuman_tpu.train.trainer import LPIPS_CROP, compute_losses_a

    lpips_crop = LPIPS_CROP if lpips_crop is None else int(lpips_crop)

    from mygauhuman_tpu.eval.lpips import lpips_distance

    n_shards = mesh_shard_count(mesh, raster_axes)
    all_axes = (data_axis,) + tuple(raster_axes)
    raster_fn = make_strip_raster_fn(raster_axes, n_shards,
                                     exchange_capacity)
    # big model constants ride as replicated shard_map ARGUMENTS (closures
    # embed as executable constants — see make_train_step)
    consts = {
        "smpl": {
            "v_template": smpl_model.v_template,
            "shapedirs": smpl_model.shapedirs,
            "posedirs": smpl_model.posedirs,
            "j_regressor": smpl_model.j_regressor,
            "weights": smpl_model.weights,
        },
        "lpips": getattr(lpips_fn, "params", None),
    }

    def body(ts: TrainState, batch: TrainBatch, consts,
             active_sh_degree: int):
        smpl = smpl_model._replace(**consts["smpl"])
        if consts["lpips"] is not None:
            lp = consts["lpips"]
            lfn = lambda a, b: lpips_distance(lp, a, b)  # noqa: E731
        else:
            lfn = lpips_fn
        cap_local = ts.gauss.capacity          # local capacity slice
        B_local = batch.gt_image.shape[0]
        gauss_aux = {
            "alive": ts.gauss.alive,
            "smpl_normal": ts.gauss.smpl_normal,
            "xyz_grad_accum": ts.gauss.xyz_grad_accum,
            "denom": ts.gauss.denom,
            "max_radii2d": ts.gauss.max_radii2d,
        }

        def one_view(params, view, m2d_off):
            gstate = G.GaussianState(
                params=params.gaussians,
                alive=gauss_aux["alive"],
                smpl_normal=gauss_aux["smpl_normal"],
                xyz_grad_accum=gauss_aux["xyz_grad_accum"],
                denom=gauss_aux["denom"],
                max_radii2d=gauss_aux["max_radii2d"],
            )
            out = render_frame(
                gstate, view.camera, view.frame, smpl,
                bg=bg, active_sh_degree=active_sh_degree,
                mlp_params={"pose_refiner": params.pose_refiner,
                            "lbs_offset": params.lbs_offset},
                config=raster_config, means2d_offset=m2d_off,
                raster_fn=raster_fn,
            )
            alive_f = gauss_aux["alive"].astype(jnp.float32)
            # global mean over ALL alive Gaussians (psum over the shards)
            s_sum = jax.lax.psum(
                jnp.sum(G.get_scaling(params.gaussians) * alive_f[:, None]),
                raster_axes,
            )
            s_cnt = jax.lax.psum(jnp.sum(alive_f) * 3, raster_axes)
            scaling_mean = s_sum / jnp.maximum(s_cnt, 1.0)
            total, metrics = compute_losses_a(out, view, scaling_mean,
                                              lfn, lpips_crop)
            return total, metrics, out.radii

        def loss_fn(params, m2d_offs):
            totals, radiis, metrics = [], [], None
            for i in range(B_local):        # static local-view loop
                view = jax.tree_util.tree_map(lambda x: x[i], batch)
                t, m, r = one_view(params, view, m2d_offs[i])
                totals.append(t)
                radiis.append(r)
                metrics = m
            local_mean = jnp.mean(jnp.asarray(totals))
            loss = jax.lax.pmean(local_mean, data_axis)
            # each raster shard carries its own replicated copy of the loss
            # through the all_gather; AD sums the copies — pre-scale.
            return loss / n_shards, (metrics, jnp.stack(radiis), loss)

        params = trainable_params(ts)
        zeros2d = jnp.zeros((B_local, cap_local, 2), jnp.float32)
        (_, (metrics, radii, loss)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, zeros2d)
        gparams, gm2d = grads

        # replicated leaves need the cross-shard sum of their path grads;
        # sharded (capacity-leading) leaves already own their full grad.
        gparams = TrainableParams(
            gaussians=jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g, data_axis), gparams.gaussians
            ),
            pose_refiner=jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g, all_axes), gparams.pose_refiner
            ),
            lbs_offset=jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g, all_axes), gparams.lbs_offset
            ),
        )

        frozen = ts.step >= cfg.pbr_iteration
        mask = geometry_freeze_mask(gparams, frozen)
        gparams = jax.tree_util.tree_map(lambda g, m: g * m, gparams, mask)

        updates, opt_state = tx.update(gparams, ts.opt_state, params)
        new_params = optax.apply_updates(params, updates)

        # densify stats (per-view magnitudes recovered from the mean loss;
        # n_shards undoes the pre-scaling, B_total undoes the view mean)
        B_total = B_local * mesh.shape[data_axis]
        scale = densify_grad_scale(batch.camera.width, batch.camera.height)
        per_view = jnp.linalg.norm(
            gm2d * scale[None, None, :] * (n_shards * B_total), axis=-1
        )
        visible = radii > 0
        stats_add = jax.lax.psum(
            jnp.sum(jnp.where(visible, per_view, 0.0), axis=0), data_axis
        )
        denom_add = jax.lax.psum(
            jnp.sum(visible.astype(jnp.float32), axis=0), data_axis
        )
        max_r = jax.lax.pmax(
            jnp.max(jnp.where(visible, radii, 0), axis=0).astype(jnp.float32),
            data_axis,
        )
        gauss = ts.gauss._replace(params=new_params.gaussians)
        gauss = gauss._replace(
            xyz_grad_accum=gauss.xyz_grad_accum + stats_add,
            denom=gauss.denom + denom_add,
            max_radii2d=jnp.maximum(gauss.max_radii2d, max_r),
        )

        new_ts = TrainState(
            gauss=gauss,
            pose_refiner=new_params.pose_refiner,
            lbs_offset=new_params.lbs_offset,
            opt_state=opt_state,
            step=ts.step + 1,
        )
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics = jax.tree_util.tree_map(
            lambda m: jax.lax.pmean(jnp.asarray(m, jnp.float32), data_axis),
            metrics,
        )
        return new_ts, metrics

    spec_g = P(raster_axes)
    spec_d = P(data_axis)
    repl = P()

    def ts_specs(ts: TrainState):
        return _ts_specs(ts, spec_g, repl)

    def batch_specs(batch: TrainBatch):
        return _batch_specs(batch, spec_d, repl)

    @functools.partial(jax.jit, static_argnums=(3,))
    def _step(ts: TrainState, batch: TrainBatch, consts,
              active_sh_degree: int):
        tspec = ts_specs(ts)
        cspec = jax.tree_util.tree_map(lambda _: repl, consts)
        sharded = shard_map(
            lambda t, b, c: body(t, b, c, active_sh_degree),
            mesh=mesh,
            in_specs=(tspec, batch_specs(batch), cspec),
            out_specs=(tspec, repl),
            check_vma=False,
        )
        return sharded(ts, batch, consts)

    def step(ts: TrainState, batch: TrainBatch, active_sh_degree: int):
        # pre-shard: one executable instead of an unsharded-inputs compile
        # on the first call plus a sharded-inputs compile on the rest
        ts = _place(ts, ts_specs(ts), mesh)
        batch = _place(batch, batch_specs(batch), mesh)
        return _step(ts, batch, consts, int(active_sh_degree))

    return step


# ----------------------------------------------------------------------------
# Tile-sharded PBR (branch-B) step — phase B under the same mesh as phase A.
#
# The reference has no analogue (single GPU); the TPU build defines the
# behavior explicitly (VERDICT r4 missing #2): the G-buffer render runs the
# strip-sharded rasterizer (per-Gaussian material params sharded over the
# raster axes), the split-sum shading + image losses are computed replicated
# per shard (the all_gather of the strips already put the full image on every
# shard — same 1/n_shards loss pre-scaling as phase A), the cubemap light +
# irradiance volumes are REPLICATED params whose grads psum over every axis
# (the same pattern as the MLPs in make_tile_sharded_train_step), and the
# global-KNN material smoothness term all_gathers the local albedo/roughness
# shards (tiny: cap x 4 floats). The occlusion BAKE stays a replicated
# host-driven program (train/pbr.py train_loop_pbr): it runs once per camera
# off the step's critical path, on the jit-of-sharded-arrays path.
# ----------------------------------------------------------------------------


def make_tile_sharded_pbr_step(
    smpl_model: SMPLModel,
    tx: optax.GradientTransformation,
    light_tx: optax.GradientTransformation,
    cfg: OptimizationConfig,
    raster_config: RasterizerConfig,
    bg: jnp.ndarray,
    mesh,
    raster_axes: tuple = ("gauss", "tiles"),
    data_axis: str = "data",
    exchange_capacity: int = 4096,
    lpips_fn=None,
):
    """Returns step(ts, pbr_state, batch, knn3, occ_col, prefilter_w,
    active_sh_degree) — the sharded mirror of train/pbr.py's
    make_pbr_train_step: `ts` per-Gaussian leaves shard over raster_axes,
    `batch` + `occ_col` ([B, cap, 3]) lead with a data-sharded batch axis,
    `pbr_state`/`knn3`/`prefilter_w` replicate."""
    import functools

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from mygauhuman_tpu.eval.lpips import lpips_distance
    from mygauhuman_tpu.parallel.raster import (
        make_strip_raster_fn,
        mesh_shard_count,
    )
    from mygauhuman_tpu.train.pbr import (
        PbrState,
        canonical_view_dirs,
        compute_losses_pbr,
    )
    from mygauhuman_tpu.pbr.shade import get_brdf_lut

    n_shards = mesh_shard_count(mesh, raster_axes)
    all_axes = (data_axis,) + tuple(raster_axes)
    raster_fn = make_strip_raster_fn(raster_axes, n_shards,
                                     exchange_capacity)
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

    def body(ts: TrainState, pbr_state: PbrState, batch: TrainBatch,
             knn3, occ_col, prefilter_w, consts, active_sh_degree: int):
        smpl = smpl_model._replace(**consts["smpl"])
        brdf_lut = consts["brdf_lut"]
        if consts["lpips"] is not None:
            lp = consts["lpips"]
            lfn = lambda a, b: lpips_distance(lp, a, b)  # noqa: E731
        else:
            lfn = lpips_fn
        B_local = batch.gt_image.shape[0]
        gauss_aux = {
            "alive": ts.gauss.alive,
            "smpl_normal": ts.gauss.smpl_normal,
            "xyz_grad_accum": ts.gauss.xyz_grad_accum,
            "denom": ts.gauss.denom,
            "max_radii2d": ts.gauss.max_radii2d,
        }

        def one_view(params, light_vol, view, occ_one):
            # geometry + MLPs frozen in phase B: stop_gradient here prunes
            # the geometry backward from the AD graph entirely (see
            # train/pbr.py loss_fn — grads are identical structural zeros)
            sg = jax.lax.stop_gradient
            g = params.gaussians
            params = params._replace(
                gaussians=g._replace(
                    xyz=sg(g.xyz), features_dc=sg(g.features_dc),
                    features_rest=sg(g.features_rest),
                    scaling=sg(g.scaling), rotation=sg(g.rotation),
                    opacity=sg(g.opacity),
                ),
                pose_refiner=sg(params.pose_refiner),
                lbs_offset=sg(params.lbs_offset),
            )
            gstate = G.GaussianState(
                params=params.gaussians,
                alive=gauss_aux["alive"],
                smpl_normal=gauss_aux["smpl_normal"],
                xyz_grad_accum=gauss_aux["xyz_grad_accum"],
                denom=gauss_aux["denom"],
                max_radii2d=gauss_aux["max_radii2d"],
            )
            out = render_frame(
                gstate, view.camera, view.frame, smpl,
                bg=bg, active_sh_degree=active_sh_degree,
                mlp_params={"pose_refiner": params.pose_refiner,
                            "lbs_offset": params.lbs_offset},
                config=raster_config, occlusion_color=occ_one,
                raster_fn=raster_fn,
            )
            # the KNN smoothness term needs GLOBAL-capacity materials
            # (knn3 holds global ids): all_gather the local shards in the
            # P(raster_axes) partition order
            albedo_g = jax.lax.all_gather(
                G.get_albedo(params.gaussians), raster_axes,
                axis=0, tiled=True)
            rough_g = jax.lax.all_gather(
                G.get_roughness(params.gaussians), raster_axes,
                axis=0, tiled=True)
            alive_g = jax.lax.all_gather(
                gauss_aux["alive"].astype(jnp.float32), raster_axes,
                axis=0, tiled=True)
            view_dirs = canonical_view_dirs(view.camera)
            total, metrics = compute_losses_pbr(
                out, view, light_vol["light"], albedo_g, rough_g, alive_g,
                knn3, view_dirs, brdf_lut, lfn, prefilter_w,
            )
            return total, metrics

        def loss_fn(params, light_vol):
            totals, metrics = [], None
            for i in range(B_local):       # static local-view loop
                view = jax.tree_util.tree_map(lambda x: x[i], batch)
                t, m = one_view(params, light_vol, view, occ_col[i])
                totals.append(t)
                metrics = m
            local_mean = jnp.mean(jnp.asarray(totals))
            loss = jax.lax.pmean(local_mean, data_axis)
            # each raster shard carries its own replicated copy of the loss
            # through the all_gather; AD sums the copies — pre-scale.
            return loss / n_shards, (metrics, loss)

        params = trainable_params(ts)
        light_vol = {
            "light": pbr_state.light,
            "volumes": pbr_state.volumes.coefficients,
        }
        (_, (metrics, loss)), (gparams, glight) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, light_vol)

        # sharded gaussian grads: each shard owns its slice; sum view
        # contributions over the data axis. Geometry + MLPs are frozen in
        # phase B (update_learning_rate parity, gaussian_model.py:289-307)
        # so their grads are zeroed rather than psum'd.
        g = jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, data_axis), gparams.gaussians
        )
        gparams = TrainableParams(
            gaussians=g._replace(
                xyz=jnp.zeros_like(g.xyz),
                features_dc=jnp.zeros_like(g.features_dc),
                features_rest=jnp.zeros_like(g.features_rest),
                scaling=jnp.zeros_like(g.scaling),
                rotation=jnp.zeros_like(g.rotation),
                opacity=jnp.zeros_like(g.opacity),
            ),
            pose_refiner=jax.tree_util.tree_map(
                jnp.zeros_like, gparams.pose_refiner),
            lbs_offset=jax.tree_util.tree_map(
                jnp.zeros_like, gparams.lbs_offset),
        )
        # replicated light/volume grads: sum the per-shard copies
        glight = jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, all_axes), glight
        )

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
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics = jax.tree_util.tree_map(
            lambda m: jax.lax.pmean(jnp.asarray(m, jnp.float32), data_axis),
            metrics,
        )
        return new_ts, new_pbr, metrics

    spec_g = P(raster_axes)
    spec_d = P(data_axis)
    spec_do = P(data_axis, raster_axes)     # occ_col [B, cap, 3]
    repl = P()

    @functools.partial(jax.jit, static_argnums=(7,))
    def _step(ts, pbr_state, batch, knn3, occ_col, prefilter_w, consts,
              active_sh_degree: int):
        tspec = _ts_specs(ts, spec_g, repl)
        pspec = jax.tree_util.tree_map(lambda _: repl, pbr_state)
        cspec = jax.tree_util.tree_map(lambda _: repl, consts)
        wspec = jax.tree_util.tree_map(lambda _: repl, prefilter_w)
        sharded = shard_map(
            lambda t, p, b, k, o, w, c: body(
                t, p, b, k, o, w, c, active_sh_degree),
            mesh=mesh,
            in_specs=(tspec, pspec, _batch_specs(batch, spec_d, repl),
                      repl, spec_do, wspec, cspec),
            out_specs=(tspec, pspec, repl),
            check_vma=False,
        )
        return sharded(ts, pbr_state, batch, knn3, occ_col, prefilter_w,
                       consts)

    def step(ts, pbr_state, batch, knn3, occ_col, prefilter_w,
             active_sh_degree: int):
        # pre-shard (see make_tile_sharded_train_step.step)
        ts = _place(ts, _ts_specs(ts, spec_g, repl), mesh)
        batch = _place(batch, _batch_specs(batch, spec_d, repl), mesh)
        occ_col = _place(occ_col, spec_do, mesh)
        return _step(ts, pbr_state, batch, knn3, occ_col, prefilter_w,
                     consts, int(active_sh_degree))

    return step
