"""Cubemap prefiltering: cosine (diffuse) and GGX (specular) convolutions.

TPU-native replacement for the reference's CUDA kernels
(pbr/renderutils/c_src/cubemap.cu:110-297, wrapped at ops.py:391-458): at the
32x32 base resolution the FULL convolution is a pair of [6R'^2, 6R^2] matmuls
on the MXU — no bounds-rect culling or cutoff search needed, and it is
exactly differentiable w.r.t. the input texels (SURVEY.md §2.5 TPU note).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mygauhuman_tpu.pbr.cubemap import face_directions, texel_solid_angles


def diffuse_weights(R: int) -> jnp.ndarray:
    """Constant [6R^2, 6R^2] cosine-convolution weight matrix."""
    dirs = face_directions(R).reshape(-1, 3)          # [6R^2, 3]
    omega = texel_solid_angles(R).reshape(-1)         # [6R^2]
    cos = jnp.maximum(dirs @ dirs.T, 0.0)             # [out, in] (MXU)
    return cos * omega[None, :] / jnp.pi


def diffuse_cubemap(
    cubemap: jnp.ndarray, weights: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Cosine-hemisphere irradiance: out[o] = sum_i L_i max(N_o.L_i,0) w_i / pi.

    Parity: DiffuseCubemapFwdKernel (cubemap.cu:110-138). `weights` takes a
    precomputed diffuse_weights(R) — the matrix is a constant per resolution
    and rebuilding it inside a training step wastes a [6R^2]^2 cos/normalize
    pass every iteration (VERDICT r1 weak #5).
    """
    R = cubemap.shape[1]
    w = weights if weights is not None else diffuse_weights(R)
    texels = cubemap.reshape(-1, cubemap.shape[-1])
    out = jnp.einsum("oi,ic->oc", w, texels, preferred_element_type=jnp.float32)
    return out.reshape(cubemap.shape)


def _ndf_ggx(alpha_sqr: jnp.ndarray, cos_theta: jnp.ndarray) -> jnp.ndarray:
    c = jnp.clip(cos_theta, 1e-4, 1.0 - 1e-4)
    d = (c * alpha_sqr - c) * c + 1.0
    return alpha_sqr / (d * d * jnp.pi)


def specular_cubemap(
    cubemap: jnp.ndarray, roughness: float, out_res: int | None = None,
    weights: tuple | None = None,
) -> jnp.ndarray:
    """GGX split-sum prefilter at one roughness (N = V = R assumption).

    Parity: SpecularCubemapFwdKernel (cubemap.cu:246-297) — weight per texel
    = wiDotN * ndfGGX(alpha^2, NoH) * w_i / 4, normalized by the weight sum
    (ops.py:458); H = normalize(No + L_i). Identity passthrough for
    roughness=0 handled by the caller's mip schedule.
    """
    R = cubemap.shape[1]
    out_res = out_res or R
    if weights is not None:
        w, norm = weights
    else:
        w, norm = specular_weights(R, roughness, out_res)
    texels = cubemap.reshape(-1, cubemap.shape[-1])
    out = jnp.einsum("oi,ic->oc", w, texels, preferred_element_type=jnp.float32)
    out = out / norm
    return out.reshape((6, out_res, out_res, cubemap.shape[-1]))


def specular_weights(
    R: int, roughness: float, out_res: int | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Constant ([O, I] GGX weight matrix, [O, 1] normalizer) per
    (resolution, roughness) — precompute once (prefilter_weight_set)."""
    out_res = out_res or R
    out_dirs = face_directions(out_res).reshape(-1, 3)   # [O, 3]
    in_dirs = face_directions(R).reshape(-1, 3)          # [I, 3]
    omega = texel_solid_angles(R).reshape(-1)            # [I]
    alpha_sqr = (roughness * roughness) ** 2

    cos_wi = out_dirs @ in_dirs.T                        # NoL [O, I]
    h = out_dirs[:, None, :] + in_dirs[None, :, :]
    h = h / jnp.linalg.norm(h, axis=-1, keepdims=True).clip(1e-12)
    noh = jnp.einsum("oc,oic->oi", out_dirs, h)
    w = jnp.maximum(cos_wi, 0.0) * _ndf_ggx(alpha_sqr, noh) * omega[None, :] / 4.0
    norm = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-8)
    return w, norm
