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
    leaf). Use with jit(in_shardings=...) from parallel/mesh.py."""

    def single_view_loss(params: TrainableParams, gauss_aux, batch: TrainBatch,
                         m2d_off, active_sh_degree: int):
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
            gstate, batch.camera, batch.frame, smpl_model,
            bg=bg, active_sh_degree=active_sh_degree, mlp_params=mlps,
            config=raster_config, means2d_offset=m2d_off,
        )
        alive_f = gauss_aux["alive"].astype(jnp.float32)
        scaling_mean = jnp.sum(
            G.get_scaling(params.gaussians) * alive_f[:, None]
        ) / jnp.maximum(jnp.sum(alive_f) * 3, 1.0)
        total, metrics = compute_losses_a(out, batch, scaling_mean)
        return total, (metrics, out.radii)

    @functools.partial(jax.jit, static_argnums=(2,))
    def step(ts: TrainState, batch: TrainBatch, active_sh_degree: int):
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
                single_view_loss, in_axes=(None, None, 0, 0, None)
            )(params, gauss_aux, batch, m2d_off, active_sh_degree)
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

    return step


def stack_batches(batches: list[TrainBatch]) -> TrainBatch:
    """Stack single-view TrainBatches into one batched TrainBatch."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
