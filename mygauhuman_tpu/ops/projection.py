"""Per-Gaussian projection / covariance math (the rasterizer "preprocess" stage).

Embarrassingly parallel over Gaussians — on TPU this is plain vectorized jnp
that XLA fuses into a handful of VPU loops; no Pallas needed. fp32 throughout
(the +0.3 low-pass, epsilons and clamps are load-bearing for parity).

Math parity targets (formulas transcribed from the reference CUDA, not code):
  - computeCov2D (EWA splatting):     forward.cu:77-116
  - computeCov3D (scale+quat -> Sigma): forward.cu:121-152 (we use the
    normalized-quaternion Python convention, SURVEY.md Appendix A)
  - preprocess (project, conic, radius, tile rect): forward.cu:180-256
  - frustum cull (z <= 0.2):          auxiliary.h:139-164
  - ndc2Pix:                          auxiliary.h:41-44
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mygauhuman_tpu.utils.transforms import covariance6_from_scaling_rotation


class ProjectedGaussians(NamedTuple):
    """Per-Gaussian screen-space quantities (all [N, ...], fp32)."""

    means2d: jnp.ndarray      # [N, 2] pixel coords
    depths: jnp.ndarray       # [N] camera-space z
    conics: jnp.ndarray       # [N, 3] inverse 2D covariance (a, b, c)
    radii: jnp.ndarray        # [N] int32 screen radius in pixels (0 = culled)
    cov2d: jnp.ndarray        # [N, 3] 2D covariance (xx, xy, yy) before inversion
    visible: jnp.ndarray      # [N] bool: passes frustum + det + radius tests


def ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    return ((v + 1.0) * size - 1.0) * 0.5


def project_points(means3d: jnp.ndarray, full_proj: jnp.ndarray) -> jnp.ndarray:
    """World points [N,3] through a 4x4 projection; returns NDC [N,3]."""
    # full-f32 matmuls: the bf16 default moves projected points ~1 px
    hi = jax.lax.Precision.HIGHEST
    ph = jnp.matmul(means3d, full_proj[:3, :3].T, precision=hi) + full_proj[:3, 3]
    pw = jnp.matmul(means3d, full_proj[3, :3].T, precision=hi) + full_proj[3, 3]
    return ph / (pw[..., None] + 1e-7)


def compute_cov2d(
    means3d: jnp.ndarray,
    cov3d6: jnp.ndarray,
    w2c: jnp.ndarray,
    focal_x: float,
    focal_y: float,
    tan_fovx: float,
    tan_fovy: float,
) -> jnp.ndarray:
    """EWA projection of the 3D covariance to 2D screen space.

    cov2d = J W Sigma W^T J^T + 0.3 I, with J the perspective Jacobian
    evaluated at the (fov-clamped) camera-space point.

    Args:
      means3d: [N, 3] world means.
      cov3d6: [N, 6] symmetric covariance (xx, xy, xz, yy, yz, zz).
      w2c: [4, 4] world->camera (column-vector convention).
    Returns:
      [N, 3] (xx, xy, yy).
    """
    # Componentwise throughout: batched [N,2,3]/[N,3,3] dot_generals force
    # padded T(·,128) layouts (~1.9 ms/frame at 64k); elementwise chains over
    # [N] slices fuse into one VPU pass.
    t = jnp.matmul(means3d, w2c[:3, :3].T,
                   precision=jax.lax.Precision.HIGHEST) + w2c[:3, 3]
    tz = t[..., 2]
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[..., 1] / tz, -limy, limy) * tz

    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz
    # J rows (only 4 nonzero entries): j00 = fx/z, j02 = -fx x/z^2,
    #                                  j11 = fy/z, j12 = -fy y/z^2
    j00 = focal_x * inv_tz
    j02 = -focal_x * tx * inv_tz2
    j11 = focal_y * inv_tz
    j12 = -focal_y * ty * inv_tz2
    W = w2c[:3, :3]
    # T = J W: row 0 = j00*W[0,:] + j02*W[2,:]; row 1 = j11*W[1,:] + j12*W[2,:]
    t00 = j00 * W[0, 0] + j02 * W[2, 0]
    t01 = j00 * W[0, 1] + j02 * W[2, 1]
    t02 = j00 * W[0, 2] + j02 * W[2, 2]
    t10 = j11 * W[1, 0] + j12 * W[2, 0]
    t11 = j11 * W[1, 1] + j12 * W[2, 1]
    t12 = j11 * W[1, 2] + j12 * W[2, 2]

    xx, xy, xz, yy, yz, zz = (cov3d6[..., i] for i in range(6))
    # A = T Sigma (2x3), cov2d = A T^T (2x2 symmetric)
    a00 = t00 * xx + t01 * xy + t02 * xz
    a01 = t00 * xy + t01 * yy + t02 * yz
    a02 = t00 * xz + t01 * yz + t02 * zz
    a10 = t10 * xx + t11 * xy + t12 * xz
    a11 = t10 * xy + t11 * yy + t12 * yz
    a12 = t10 * xz + t11 * yz + t12 * zz
    c00 = a00 * t00 + a01 * t01 + a02 * t02
    c01 = a00 * t10 + a01 * t11 + a02 * t12
    c11 = a10 * t10 + a11 * t11 + a12 * t12
    return jnp.stack([c00 + 0.3, c01, c11 + 0.3], axis=-1)


def compute_cov3d(
    scaling: jnp.ndarray,
    quat: jnp.ndarray,
    scaling_modifier: float = 1.0,
    transform: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[N,3] scales (activated), [N,4] quats -> [N,6] symmetric covariance."""
    return covariance6_from_scaling_rotation(
        scaling, quat, scaling_modifier, transform
    )


def preprocess(
    means3d: jnp.ndarray,
    cov3d6: jnp.ndarray,
    w2c: jnp.ndarray,
    full_proj: jnp.ndarray,
    image_width: int,
    image_height: int,
    tan_fovx: float,
    tan_fovy: float,
) -> ProjectedGaussians:
    """Project Gaussians to screen space, computing conics and radii.

    Culled Gaussians (behind near plane z<=0.2, degenerate cov) get radius 0
    and visible=False; downstream binning drops them. Static shapes: nothing
    is compacted, parity with the CUDA early-returns is via masks.
    """
    means3d = means3d.astype(jnp.float32)
    cov3d6 = cov3d6.astype(jnp.float32)

    focal_x = image_width / (2.0 * tan_fovx)
    focal_y = image_height / (2.0 * tan_fovy)

    p_view_z = jnp.matmul(means3d, w2c[2, :3].T,
                          precision=jax.lax.Precision.HIGHEST) + w2c[2, 3]
    in_front = p_view_z > 0.2

    p_ndc = project_points(means3d, full_proj)
    means2d = jnp.stack(
        [ndc2pix(p_ndc[..., 0], image_width), ndc2pix(p_ndc[..., 1], image_height)],
        axis=-1,
    )

    cov2d = compute_cov2d(means3d, cov3d6, w2c, focal_x, focal_y, tan_fovx, tan_fovy)
    det = cov2d[..., 0] * cov2d[..., 2] - cov2d[..., 1] * cov2d[..., 1]
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    det_inv = 1.0 / det_safe
    conics = jnp.stack(
        [cov2d[..., 2] * det_inv, -cov2d[..., 1] * det_inv, cov2d[..., 0] * det_inv],
        axis=-1,
    )

    mid = 0.5 * (cov2d[..., 0] + cov2d[..., 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))

    visible = in_front & det_ok & (radius_f > 0.0)
    radii = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    return ProjectedGaussians(
        means2d=means2d,
        depths=p_view_z,
        conics=conics,
        radii=radii,
        cov2d=cov2d,
        visible=visible,
    )
