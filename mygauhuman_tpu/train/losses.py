"""Loss stack — static-shape, mask-weighted re-derivations of the reference.

Parity targets: utils/loss_utils.py (l1/l2/ssim/smoothness), train.py:47-95
(KDE entropy, TV), train.py:256-363 (the composed training losses),
utils/image_utils.py (psnr).

XLA re-derivations (equal math, static shapes):
  * `image[mask==1].mean()` -> sum(x*mask)/ (C*sum(mask)): identical value.
  * the cv2.boundingRect crop feeding SSIM/LPIPS (train.py:268-271) is
    data-dependent-shape; we evaluate the SSIM map over the full image and
    take its *mask-weighted* mean — same statistic restricted to the person
    region without the dynamic crop. (The crop's only purpose is to restrict
    attention to the subject; border-window differences are second-order.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(x - y))


def l2_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def masked_l1(x: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """mean of |x-y| over pixels where mask==1 (x,y: [H,W,C], mask: [H,W])."""
    m = mask[..., None]
    denom = jnp.maximum(jnp.sum(m) * x.shape[-1], 1.0)
    return jnp.sum(jnp.abs(x - y) * m) / denom


def masked_l2(x: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    if x.ndim == mask.ndim:
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        return jnp.sum(((x - y) ** 2) * mask) / denom
    m = mask[..., None]
    denom = jnp.maximum(jnp.sum(m) * x.shape[-1], 1.0)
    return jnp.sum(((x - y) ** 2) * m) / denom


def psnr(img: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Parity: utils/image_utils.py:17-24 (per-image MSE over all pixels)."""
    mse = jnp.mean((img - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


# ----------------------------------------------------------------------------
# SSIM (windowed, gaussian 11x11 sigma 1.5 — loss_utils.py:26-66)
# ----------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma**2)
    )
    g = g / g.sum()
    w = np.outer(g, g).astype(np.float32)
    return w


@functools.lru_cache(maxsize=32)
def _band_matrix(size: int, window_size: int, sigma: float) -> np.ndarray:
    """[size, size] banded gaussian-blur matrix (zero padding at borders)."""
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2 * sigma**2))
    g = (g / g.sum()).astype(np.float32)
    B = np.zeros((size, size), np.float32)
    half = window_size // 2
    for i in range(size):
        for t, w in enumerate(g):
            j = i + t - half
            if 0 <= j < size:
                B[i, j] = w
    return B


def _band_matrix_traced(size: int, window_size: int, sigma: float):
    """The banded matrix built ON DEVICE from the 11 f32 taps.

    Entry-for-entry identical to `_band_matrix` (each element is exactly
    g[t] or 0), but constructed from iota + `window_size` selects behind an
    optimization_barrier, so XLA can neither constant-fold it back into a
    [size, size] dense literal nor CSE it away into one: as a dense
    constant every `_filter2d` call site embedded its own ~1 MB copy in the
    executable (20 copies of [512,512] = half the train step's constant
    bulk, slow remote-cache loads). Construction cost is ~window_size
    elementwise passes over [size, size] — microseconds, once per filter.
    """
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2 * sigma**2))
    g = (g / g.sum()).astype(np.float32)
    i = jnp.arange(size, dtype=jnp.int32)
    off = i[None, :] - i[:, None] + window_size // 2     # j - i + half
    band = jnp.zeros((size, size), jnp.float32)
    for t in range(window_size):
        band = jnp.where(off == t, jnp.float32(g[t]), band)
    return jax.lax.optimization_barrier(band)


def _filter2d(img: jnp.ndarray, window_size: int = 11,
              sigma: float = 1.5) -> jnp.ndarray:
    """Separable gaussian blur as two banded MXU matmuls. img: [H, W, C].

    Depthwise convs lower terribly on TPU (~2.6 ms per 512^2 call); the
    banded-matmul form runs on the MXU (~0.03 ms) and its transpose —
    the same matmul with swapped operands — keeps the backward fast too.
    Matches conv SAME/zero padding exactly (separable gaussian window).
    """
    H, W = img.shape[:2]
    bh = _band_matrix_traced(H, window_size, sigma)
    bw = bh if W == H else _band_matrix_traced(W, window_size, sigma)
    y = jnp.einsum("hk,kwc->hwc", bh, img,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("hkc,wk->hwc", y, bw,
                      preferred_element_type=jnp.float32)


def ssim_map(img1: jnp.ndarray, img2: jnp.ndarray,
             window_size: int = 11) -> jnp.ndarray:
    """Per-pixel SSIM map [H, W, C] (loss_utils.py:47-60 formula)."""
    mu1 = _filter2d(img1, window_size)
    mu2 = _filter2d(img2, window_size)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2d(img1 * img1, window_size) - mu1_sq
    s2 = _filter2d(img2 * img2, window_size) - mu2_sq
    s12 = _filter2d(img1 * img2, window_size) - mu12
    c1, c2 = 0.01**2, 0.03**2
    return ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    )


def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean SSIM; with `mask` [H,W], the mask-weighted mean of the map
    (static-shape stand-in for the reference's bbox crop)."""
    m = ssim_map(img1, img2)
    if mask is None:
        return jnp.mean(m)
    mm = mask[..., None]
    return jnp.sum(m * mm) / jnp.maximum(jnp.sum(mm) * m.shape[-1], 1.0)


# ----------------------------------------------------------------------------
# TV losses (train.py:73-95)
# ----------------------------------------------------------------------------

def tv_loss(img: jnp.ndarray) -> jnp.ndarray:
    """img: [H, W, C]."""
    tv_h = jnp.mean((img[1:, :, :] - img[:-1, :, :]) ** 2)
    tv_w = jnp.mean((img[:, 1:, :] - img[:, :-1, :]) ** 2)
    return tv_h + tv_w


def masked_tv_loss(mask: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """mask: [H, W] float weights; img: [H, W, C].

    Parity: get_masked_tv_loss (train.py:82-95) — products of adjacent mask
    values weight each squared difference; plain mean over all positions.
    """
    tv_h = (img[1:, :, :] - img[:-1, :, :]) ** 2
    tv_w = (img[:, 1:, :] - img[:, :-1, :]) ** 2
    m_h = (mask[1:, :] * mask[:-1, :])[..., None]
    m_w = (mask[:, 1:] * mask[:, :-1])[..., None]
    return jnp.mean(tv_h * m_h) + jnp.mean(tv_w * m_w)


# ----------------------------------------------------------------------------
# Material smoothness + KDE entropy (loss_utils.py:102-125, train.py:47-71)
# ----------------------------------------------------------------------------

def relative_smooth_loss(values: jnp.ndarray, nn_values: jnp.ndarray,
                         mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Relative L1 between per-point values and their KNN neighbors.

    values: [N, C]; nn_values: [N, K, C]. Parity: get_albedo_smooth_loss /
    get_roughness_smooth_loss (albedo scales by neighbor mean, roughness by
    neighbor sum — for K=2 they differ by 2x; we take the mean convention and
    callers scale).
    """
    diff = jnp.abs(values[:, None, :] - nn_values)
    scale = jnp.mean(nn_values, axis=1, keepdims=True) + 1e-6
    rel = diff / scale
    if mask is None:
        return jnp.mean(rel)
    m = mask[:, None, None]
    return jnp.sum(rel * m) / jnp.maximum(
        jnp.sum(m) * rel.shape[1] * rel.shape[2], 1.0
    )


def gaussian_histogram(x: jnp.ndarray, bins: int = 15,
                       lo: float = 0.0, hi: float = 1.0) -> jnp.ndarray:
    """Soft KDE histogram [bins, C] (train.py:47-56)."""
    x = x.reshape(-1, x.shape[-1])
    sigma = jnp.var(x, axis=0)
    delta = (hi - lo) / bins
    centers = lo + delta * (jnp.arange(bins, dtype=x.dtype) + 0.5)
    d = x[None] - centers[:, None, None]                  # [bins, N, C]
    h = jnp.exp(-0.5 * (d / (sigma + 1e-12)) ** 2) / (
        (sigma + 1e-12) * np.sqrt(2 * np.pi)
    ) * delta
    return jnp.sum(h, axis=1)


def gaussian_entropy(x: jnp.ndarray, bins: int = 15) -> jnp.ndarray:
    """Sum of per-channel KDE entropies (train.py:58-71)."""
    h = gaussian_histogram(x, bins)
    eps = 1e-6
    total = jnp.sum(h, axis=0)                             # [C]
    hn = jnp.where(total[None] > eps, h / (total[None] + 1e-12) + eps,
                   jnp.ones_like(h))
    return jnp.sum(-hn * jnp.log(hn))


def predicted_normal_loss(
    normal: jnp.ndarray,      # [H, W, 3] predicted (unit or near-unit)
    normal_ref: jnp.ndarray,  # [H, W, 3] reference normals
    weight: jnp.ndarray | None = None,   # [H, W] e.g. eroded alpha
) -> jnp.ndarray:
    """Ref-NeRF predicted-normal penalty: w * (1 - n.n_ref), mean.

    Parity: utils/loss_utils.py predicted_normal_loss (:68-93) — shipped but
    unused by the reference training loop; provided for API completeness.
    """
    if weight is None:
        weight = jnp.ones(normal.shape[:2], normal.dtype)
    dot = jnp.sum(normal * jax.lax.stop_gradient(normal_ref), axis=-1)
    return jnp.mean(weight * (1.0 - dot))


def latent_kl_loss(latent_values: jnp.ndarray, rho: float = 0.05) -> jnp.ndarray:
    """Sparsity KL for latent BRDF codes (Bernoulli KL against a target
    activation rate rho over sigmoid'd latents).

    Parity: utils/loss_utils.py get_kl_loss/kl_divergence (:92-100) —
    shipped for the latent-BRDF surface (nets/brdf_network.py, inactive in
    the reference's published configs; see models/brdf_mlp.py)."""
    rho_hat = jnp.mean(jax.nn.sigmoid(latent_values.reshape(-1, 32)), axis=0)
    return jnp.mean(
        rho * jnp.log(rho / rho_hat)
        + (1.0 - rho) * jnp.log((1.0 - rho) / (1.0 - rho_hat))
    )
