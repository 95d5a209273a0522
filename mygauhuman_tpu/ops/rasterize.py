"""Differentiable Gaussian rasterizer: preprocess -> bin -> blend.

Public entry for the whole compute path the reference implements in
`submodules/diff-gaussian-rasterization` (autograd binding
diff_gaussian_rasterization/__init__.py:21-223 + the CUDA pipeline,
SURVEY.md §2.1). Differences by design, not omission:

  * One multi-channel pass: callers stack rgb/normal/albedo/occlusion/... as
    feature columns; the reference re-runs the whole pipeline 7x per frame.
  * Gradients via JAX autodiff of the masked-cumprod blend (ops/blend.py) —
    deterministic segment reductions instead of atomicAdd.
  * dL/dmeans2D for densification stats is harvested by differentiating wrt
    the explicit `means2d_offset` input (zeros) — the JAX-native equivalent
    of the reference's `screenspace_points.retain_grad()` trick
    (gaussian_renderer/__init__.py:61-65, train.py:403-404).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mygauhuman_tpu.ops.binning import bin_gaussians
from mygauhuman_tpu.ops.blend import blend
from mygauhuman_tpu.ops.pallas_blend import blend_pallas
from mygauhuman_tpu.ops.projection import preprocess


class RasterizerConfig(NamedTuple):
    tile_w: int = 16
    tile_h: int = 16
    max_tiles_per_gaussian: int = 16
    tile_capacity: int = 1024
    chunk_tiles: int = 64
    use_pallas: bool = False      # Pallas blend kernel (TPU); jnp otherwise
    pallas_interpret: bool = False  # interpret-mode Pallas (CPU testing)
    pallas_kernel_bwd: bool = True  # Pallas backward kernel (vs jnp autodiff)
    instance_capacity: int | None = None  # compacted instance-list cap I
                                  # (None = exact N*S; see bin_gaussians)


class RasterizeOutput(NamedTuple):
    image: jnp.ndarray        # [H, W, C]
    alpha: jnp.ndarray        # [H, W]  (sum of blend weights — parity forward.cu:380)
    depth: jnp.ndarray        # [H, W]
    final_t: jnp.ndarray      # [H, W]
    radii: jnp.ndarray        # [N] int32
    means2d: jnp.ndarray      # [N, 2] pixel coords
    visible: jnp.ndarray      # [N] bool (frustum + rect test)
    overflow_tiles: jnp.ndarray
    overflow_gauss: jnp.ndarray
    overflow_inst: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "config"),
)
def rasterize(
    means3d: jnp.ndarray,       # [N, 3] world
    cov3d6: jnp.ndarray,        # [N, 6] symmetric world covariance
    opacities: jnp.ndarray,     # [N] activated (sigmoid) opacity
    features: jnp.ndarray,      # [N, C] per-Gaussian blended channels
    w2c: jnp.ndarray,           # [4, 4]
    full_proj: jnp.ndarray,     # [4, 4]
    bg: jnp.ndarray,            # [C]
    *,
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    config: RasterizerConfig = RasterizerConfig(),
    means2d_offset: jnp.ndarray | None = None,
    alive: jnp.ndarray | None = None,
) -> RasterizeOutput:
    """Render one camera. `alive` masks padded slots of fixed-capacity arrays."""
    proj = preprocess(
        means3d, cov3d6, w2c, full_proj, width, height, tan_fovx, tan_fovy
    )
    means2d = proj.means2d
    if means2d_offset is not None:
        means2d = means2d + means2d_offset
    visible = proj.visible if alive is None else (proj.visible & alive)

    bins = bin_gaussians(
        jax.lax.stop_gradient(means2d),
        proj.radii,
        jax.lax.stop_gradient(proj.depths),
        visible,
        width=width,
        height=height,
        tile_w=config.tile_w,
        tile_h=config.tile_h,
        max_tiles_per_gaussian=config.max_tiles_per_gaussian,
        tile_capacity=config.tile_capacity,
        instance_capacity=config.instance_capacity,
    )
    if config.use_pallas:
        out = blend_pallas(
            bins.sorted_rank,
            bins.order,
            bins.rank,
            bins.starts,
            jnp.minimum(bins.counts, config.tile_capacity),  # match jnp K cap
            means2d,
            proj.conics,
            opacities,
            features,
            proj.depths,
            bg,
            width,
            height,
            config.tile_w,
            config.tile_h,
            config.chunk_tiles,
            config.tile_capacity,
            config.pallas_interpret,
            config.pallas_kernel_bwd,
        )
    else:
        out = blend(
            bins.idx,
            bins.valid,
            means2d,
            proj.conics,
            opacities,
            features,
            proj.depths,
            bg,
            width=width,
            height=height,
            tile_w=config.tile_w,
            tile_h=config.tile_h,
            chunk_tiles=config.chunk_tiles,
        )
    radii = jnp.where(visible, proj.radii, 0)
    return RasterizeOutput(
        image=out.image,
        alpha=out.alpha,
        depth=out.depth,
        final_t=out.final_t,
        radii=radii,
        means2d=means2d,
        visible=visible,
        overflow_tiles=bins.overflow_tiles,
        overflow_gauss=bins.overflow_gauss,
        overflow_inst=bins.overflow_inst,
    )


def densify_grad_scale(width: int, height: int) -> jnp.ndarray:
    """Pixel-grad -> reference NDC-grad units for the densify threshold.

    The reference accumulates ||dL/dmean2D|| where dL/dmean2D carries the
    ddelx_dx = 0.5*W factor (backward.cu:472-473,574-575); our means2d_offset
    grads are in pixels, so multiply by [0.5*W, 0.5*H] before comparing with
    densify_grad_threshold = 2e-4.
    """
    return jnp.array([0.5 * width, 0.5 * height], jnp.float32)


def mark_visible(
    means3d: jnp.ndarray, w2c: jnp.ndarray, full_proj: jnp.ndarray,
    znear: float = 0.2,
) -> jnp.ndarray:
    """Frustum visibility test [N] bool without rendering.

    Parity: GaussianRasterizer.markVisible
    (diff_gaussian_rasterization/__init__.py:201-213) / in_frustum
    (auxiliary.h:139-164): camera-space z > znear.
    """
    hom = jnp.concatenate(
        [means3d, jnp.ones_like(means3d[:, :1])], axis=-1
    )
    cam = hom @ w2c.T
    return cam[:, 2] > znear
