"""Rotation / rigid-transform helpers (pure jnp, fp32).

Math parity targets (formulas transcribed, not code):
  - quaternion -> rotation: reference forward.cu:118-152 (computeCov3D) and
    utils/general_utils.py build_rotation (normalized-quaternion convention —
    we follow the Python side, see SURVEY.md Appendix A).
  - Rodrigues: reference scene/gaussian_model.py:894-921 (batch_rodrigues_torch)
    and nets/mlp_delta_body_pose.py RodriguesModule (1e-5-regularized variant).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    # rsqrt(sum^2 + eps) keeps the gradient finite at v == 0 (zero vectors
    # occur on dead capacity slots); jnp.linalg.norm would give NaN grads.
    return v * jax.lax.rsqrt(
        jnp.sum(v * v, axis=axis, keepdims=True) + eps * eps
    )


def quat_to_rotmat(q: jnp.ndarray, normalize_quat: bool = True) -> jnp.ndarray:
    """Quaternion (w, x, y, z) [..., 4] -> rotation matrix [..., 3, 3]."""
    if normalize_quat:
        q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rodrigues(rvec: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle [..., 3] -> rotation matrix [..., 3, 3].

    Matches reference batch_rodrigues_torch: angle = ||r + eps||.
    """
    angle = jnp.linalg.norm(rvec + eps, axis=-1, keepdims=True)
    axis = rvec / angle
    c = jnp.cos(angle)[..., None]
    s = jnp.sin(angle)[..., None]
    rx, ry, rz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [
            jnp.stack([zeros, -rz, ry], axis=-1),
            jnp.stack([rz, zeros, -rx], axis=-1),
            jnp.stack([-ry, rx, zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.eye(3, dtype=rvec.dtype)
    return eye + s * K + (1.0 - c) * (K @ K)


def rodrigues_mlp(rvec: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues with theta = sqrt(1e-5 + ||r||^2) regularization.

    Matches the pose-refiner MLP head (nets/mlp_delta_body_pose.py:172-198):
    near r = 0 it yields a rotation close to (but not exactly) identity, which
    combined with the tiny last-layer init makes the initial correction ~ I.
    """
    theta = jnp.sqrt(1e-5 + jnp.sum(rvec**2, axis=-1, keepdims=True))
    axis = rvec / theta
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    one = jnp.ones_like(x)
    cth = jnp.cos(theta)[..., 0]
    sth = jnp.sin(theta)[..., 0]
    # row-major entries, mirroring the analytic axis-angle matrix
    r00 = x * x + (one - x * x) * cth
    r01 = x * y * (one - cth) - z * sth
    r02 = x * z * (one - cth) + y * sth
    r10 = x * y * (one - cth) + z * sth
    r11 = y * y + (one - y * y) * cth
    r12 = y * z * (one - cth) - x * sth
    r20 = x * z * (one - cth) - y * sth
    r21 = y * z * (one - cth) + x * sth
    r22 = z * z + (one - z * z) * cth
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def build_scaling_rotation(scaling: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s): [..., 3] x [..., 4] -> [..., 3, 3]."""
    R = quat_to_rotmat(quat)
    return R * scaling[..., None, :]


def covariance_from_scaling_rotation(
    scaling: jnp.ndarray,
    quat: jnp.ndarray,
    scaling_modifier: float = 1.0,
    transform: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """World covariance Sigma = L L^T, optionally conjugated by an LBS rotation.

    Parity: scene/gaussian_model.py:35-42 (build_covariance_from_scaling_rotation)
    — returns the full symmetric [..., 3, 3] matrix (use strip_symmetric for the
    6-vector form the rasterizer consumes).
    """
    L = build_scaling_rotation(scaling_modifier * scaling, quat)
    cov = L @ jnp.swapaxes(L, -1, -2)
    if transform is not None:
        cov = transform @ cov @ jnp.swapaxes(transform, -1, -2)
    return cov


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] symmetric -> [..., 6] (xx, xy, xz, yy, yz, zz)."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def unstrip_symmetric(c6: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] -> [..., 3, 3] symmetric."""
    xx, xy, xz, yy, yz, zz = (c6[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(x / (1.0 - x))


# ----------------------------------------------------------------------------
# Componentwise (struct-of-arrays) forms for the per-Gaussian hot path.
#
# Batched small-matrix ops ([N,3,3] @ [N,3] dot_generals and their stacked
# intermediates) force XLA to materialize T(·,128)-tiled layouts where a 3x3
# matrix occupies a 4x128 tile — ~40x memory waste; at 64k Gaussians the
# profiler attributed ~6 ms/frame to exactly these ops. The componentwise
# forms below express the same math as elementwise chains over [N] column
# slices, which XLA fuses into neighboring VPU loops with no materialized
# small-matrix intermediates. Same values, same gradients (plain arithmetic).
# ----------------------------------------------------------------------------

def quat_to_rotmat_cols(q: jnp.ndarray, normalize_quat: bool = True) -> tuple:
    """Quaternion (w,x,y,z) [N,4] -> 9 rotation components, each [N].

    Row-major order (r00..r22) — identical math to quat_to_rotmat."""
    if normalize_quat:
        q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return (
        1.0 - 2.0 * (y * y + z * z),
        2.0 * (x * y - w * z),
        2.0 * (x * z + w * y),
        2.0 * (x * y + w * z),
        1.0 - 2.0 * (x * x + z * z),
        2.0 * (y * z - w * x),
        2.0 * (x * z - w * y),
        2.0 * (y * z + w * x),
        1.0 - 2.0 * (x * x + y * y),
    )


def mat_cols(m: jnp.ndarray) -> tuple:
    """[N, 3, 3] -> 9 row-major component slices (each [N])."""
    return tuple(m[..., i, j] for i in range(3) for j in range(3))


def rot_apply(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """einsum('nij,nj->ni') without the batched dot_general: y = M v."""
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = mat_cols(m)
    v0, v1, v2 = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [
            m00 * v0 + m01 * v1 + m02 * v2,
            m10 * v0 + m11 * v1 + m12 * v2,
            m20 * v0 + m21 * v1 + m22 * v2,
        ],
        axis=-1,
    )


def covariance6_from_scaling_rotation(
    scaling: jnp.ndarray,
    quat: jnp.ndarray,
    scaling_modifier: float = 1.0,
    transform: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Componentwise Sigma = (R S)(R S)^T (optionally T Sigma T^T) -> [N, 6].

    Same math as covariance_from_scaling_rotation + strip_symmetric with no
    [N,3,3] intermediates. 6-vector order: (xx, xy, xz, yy, yz, zz)."""
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = quat_to_rotmat_cols(quat)
    s0 = scaling_modifier * scaling[..., 0]
    s1 = scaling_modifier * scaling[..., 1]
    s2 = scaling_modifier * scaling[..., 2]
    # M = R diag(s); Sigma_ij = sum_k s_k^2 R_ik R_jk
    a, b, c = s0 * s0, s1 * s1, s2 * s2
    xx = a * r00 * r00 + b * r01 * r01 + c * r02 * r02
    xy = a * r00 * r10 + b * r01 * r11 + c * r02 * r12
    xz = a * r00 * r20 + b * r01 * r21 + c * r02 * r22
    yy = a * r10 * r10 + b * r11 * r11 + c * r12 * r12
    yz = a * r10 * r20 + b * r11 * r21 + c * r12 * r22
    zz = a * r20 * r20 + b * r21 * r21 + c * r22 * r22
    if transform is not None:
        t00, t01, t02, t10, t11, t12, t20, t21, t22 = mat_cols(transform)
        # A = T Sigma (rows of T times symmetric Sigma), then C = A T^T
        a00 = t00 * xx + t01 * xy + t02 * xz
        a01 = t00 * xy + t01 * yy + t02 * yz
        a02 = t00 * xz + t01 * yz + t02 * zz
        a10 = t10 * xx + t11 * xy + t12 * xz
        a11 = t10 * xy + t11 * yy + t12 * yz
        a12 = t10 * xz + t11 * yz + t12 * zz
        a20 = t20 * xx + t21 * xy + t22 * xz
        a21 = t20 * xy + t21 * yy + t22 * yz
        a22 = t20 * xz + t21 * yz + t22 * zz
        xx = a00 * t00 + a01 * t01 + a02 * t02
        xy = a00 * t10 + a01 * t11 + a02 * t12
        xz = a00 * t20 + a01 * t21 + a02 * t22
        yy = a10 * t10 + a11 * t11 + a12 * t12
        yz = a10 * t20 + a11 * t21 + a12 * t22
        zz = a20 * t20 + a21 * t21 + a22 * t22
    return jnp.stack([xx, xy, xz, yy, yz, zz], axis=-1)


def inv3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate) batched 3x3 inverse.

    ~10x faster than jnp.linalg.inv's LU path on TPU for [N,3,3] batches
    (the LBS deform inverts a blend of rotation matrices per Gaussian every
    frame, gaussian_model.py:788-791 equivalent).
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    # Guard the LBS candy-wrapper singularity: blends of opposing joint
    # rotations can be (near-)singular; an unguarded 1/det makes one bad
    # Gaussian's NaN poison every parameter through the shared reductions.
    det = jnp.where(jnp.abs(det) < 1e-8, jnp.sign(det) * 1e-8 + 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A, B, C], axis=-1),
            jnp.stack([D, E, F], axis=-1),
            jnp.stack([G, H, I], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]
