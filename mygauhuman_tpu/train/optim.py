"""Optimizer: per-group Adam with the reference's LRs + densify-aware state.

Parity: gaussian_model.py:250-307 — one Adam (eps 1e-15) with named param
groups, xyz on an exponential-decay schedule scaled by the scene extent, and
geometry frozen past `pbr_iteration`. The reference surgically rebuilds
optimizer state on densify events (:424-485); with fixed-capacity arrays we
instead zero the Adam moments at rewritten slots (`reset_adam_slots`), which
is exactly what `cat_tensors_to_optimizer` achieves for appended points.

Implementation: optax.multi_transform over a label pytree; every group is
chain(scale_by_adam(eps=1e-15), scale_by_lr). Freezing past pbr_iteration is
a gradient mask inside the train step (not an optimizer concern).
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from mygauhuman_tpu.config import OptimizationConfig
from mygauhuman_tpu.models.gaussians import GaussianParams


class TrainableParams(NamedTuple):
    """The full trainable pytree: scene params + correction MLPs."""

    gaussians: GaussianParams
    pose_refiner: Any      # dict pytree or None-like empty dict
    lbs_offset: Any


def expon_lr(
    step: jnp.ndarray,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
) -> jnp.ndarray:
    """Log-lerp LR schedule. Parity: utils/general_utils.py:29-62."""
    if lr_init <= 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    t = jnp.clip(jnp.asarray(step, jnp.float32) / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(
        math.log(lr_init) * (1.0 - t) + math.log(max(lr_final, 1e-30)) * t
    )
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay = 1.0
    return delay * log_lerp


def _label_tree(params: TrainableParams) -> TrainableParams:
    g = params.gaussians
    glabels = GaussianParams(
        xyz=jax.tree_util.tree_map(lambda _: "xyz", g.xyz),
        features_dc="f_dc",
        features_rest="f_rest",
        scaling="scaling",
        rotation="rotation",
        opacity="opacity",
        normal="normal",
        albedo="albedo",
        roughness="roughness",
    )
    return TrainableParams(
        gaussians=glabels,
        pose_refiner=jax.tree_util.tree_map(lambda _: "pose_decoder",
                                            params.pose_refiner),
        lbs_offset=jax.tree_util.tree_map(lambda _: "lweight_offset_decoder",
                                          params.lbs_offset),
    )


def make_optimizer(
    cfg: OptimizationConfig,
    params: TrainableParams,
    spatial_lr_scale: float = 1.0,
) -> optax.GradientTransformation:
    """Per-group Adam. LR table parity: gaussian_model.py:266-282."""

    def adam(lr) -> optax.GradientTransformation:
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=cfg.adam_eps),
            optax.scale_by_learning_rate(lr),  # lr may be a schedule fn
        )

    def xyz_schedule(step):
        return expon_lr(
            step,
            cfg.position_lr_init * spatial_lr_scale,
            cfg.position_lr_final * spatial_lr_scale,
            lr_delay_mult=cfg.position_lr_delay_mult,
            max_steps=cfg.position_lr_max_steps,
        )

    transforms = {
        "xyz": adam(xyz_schedule),
        "f_dc": adam(cfg.feature_lr),
        "f_rest": adam(cfg.feature_lr / 20.0),
        "opacity": adam(cfg.opacity_lr),
        "scaling": adam(cfg.scaling_lr),
        "rotation": adam(cfg.rotation_lr),
        "normal": adam(cfg.normal_lr),
        "albedo": adam(cfg.opacity_lr),       # reference reuses opacity_lr
        "roughness": adam(cfg.opacity_lr),
        "pose_decoder": adam(cfg.pose_refine_lr),
        "lweight_offset_decoder": adam(cfg.lbs_offset_lr),
    }
    return optax.multi_transform(transforms, _label_tree(params))


def reset_adam_slots(opt_state, written: jnp.ndarray, capacity: int):
    """Zero first-moment/second-moment rows at densify-rewritten slots.

    Any state leaf whose leading dim equals the Gaussian capacity is a
    per-Gaussian moment; rows in `written` get fresh (zero) moments, matching
    the reference's zero-init for appended tensors (gaussian_model.py:468-477).
    """

    def reset(path, leaf):
        if (hasattr(leaf, "shape") and leaf.ndim >= 1
                and leaf.shape[0] == capacity and is_gaussian_path(path)):
            shape = (capacity,) + (1,) * (leaf.ndim - 1)
            return jnp.where(written.reshape(shape), 0, leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(reset, opt_state)


def is_gaussian_path(path) -> bool:
    """True iff a pytree path descends through the per-Gaussian subtree.

    Adam-moment trees mirror TrainableParams (field `gaussians`), TrainState
    trees hold the scene under `gauss` — matching the PATH, not just the
    leading dim, is what keeps MLP layers of width == capacity (the pose /
    LBS MLPs are 128 wide) from being mistaken for per-Gaussian rows when
    the scene capacity is also 128."""
    for entry in path:
        name = getattr(entry, "name", getattr(entry, "key", None))
        if name in ("gaussians", "gauss"):
            return True
    return False


def grow_opt_state(opt_state, old_capacity: int, new_capacity: int):
    """Zero-pad per-Gaussian Adam moment rows to a larger capacity.

    Companion to models.gaussians.grow_capacity: state leaves on a
    `gaussians` path with leading dim == old capacity are per-Gaussian
    moments and get zero rows appended (fresh moments for the new slots,
    same convention as reset_adam_slots).
    """
    assert new_capacity >= old_capacity

    def grow(path, leaf):
        if (
            hasattr(leaf, "shape")
            and leaf.ndim >= 1
            and leaf.shape[0] == old_capacity
            and is_gaussian_path(path)
        ):
            pad = jnp.zeros(
                (new_capacity - old_capacity,) + leaf.shape[1:], leaf.dtype
            )
            return jnp.concatenate([leaf, pad], axis=0)
        return leaf

    return jax.tree_util.tree_map_with_path(grow, opt_state)


def geometry_freeze_mask(params: TrainableParams, frozen: jnp.ndarray):
    """Gradient multiplier pytree: 0 for geometry when `frozen` (scalar bool).

    Parity: update_learning_rate past pbr_iteration freezes xyz/features/
    opacity/scaling/rotation/pose_decoder/lweight_offset_decoder
    (gaussian_model.py:289-307); albedo/roughness/normal stay live.
    """
    live = jnp.asarray(1.0, jnp.float32)
    dead = jnp.where(frozen, 0.0, 1.0).astype(jnp.float32)

    def fill(tree, value):
        return jax.tree_util.tree_map(lambda _: value, tree)

    g = params.gaussians
    gmask = GaussianParams(
        xyz=dead,
        features_dc=dead,
        features_rest=dead,
        scaling=dead,
        rotation=dead,
        opacity=dead,
        normal=live,
        albedo=live,
        roughness=live,
    )
    return TrainableParams(
        gaussians=gmask,
        pose_refiner=fill(params.pose_refiner, dead),
        lbs_offset=fill(params.lbs_offset, dead),
    )


def reset_opacity_moments(opt_state):
    """Zero the Adam moments of the opacity group after an opacity reset.

    Parity: replace_tensor_to_optimizer (gaussian_model.py:407-422) zeroes
    exp_avg/exp_avg_sq for the replaced tensor. With multi_transform the
    opacity group's state is isolated under inner_states['opacity'], so
    zeroing its float leaves (keeping integer step counts) is exact.
    """

    def zero_floats(tree):
        return jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    inner = dict(opt_state.inner_states)
    inner["opacity"] = zero_floats(inner["opacity"])
    return opt_state._replace(inner_states=inner)
