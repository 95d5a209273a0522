"""LPIPS perceptual metric — VGG16 feature distance in pure JAX.

Replaces the reference's `lpips` pip package (train.py:36-37, the 0.01*lpips
training term) and the vendored lpipsPyTorch (metrics.py path). Architecture
parity with lpips-VGG: five feature stages (relu1_2, relu2_2, relu3_3,
relu4_3, relu5_3), channel-unit-normalized, squared difference, 1x1 linear
head per stage, spatial mean, summed.

Weights: this environment has no network egress and ships no pretrained VGG,
so by default the backbone uses DETERMINISTIC random conv features (seeded He
init). Random-VGG LPIPS is a valid perceptual-ish distance (random conv
features preserve texture statistics) but does NOT reproduce published LPIPS
numbers — pass `weights_file=` (an .npz exported from torchvision VGG16 +
lpips linear heads via `export_torch_weights`) for exact parity.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, pool_before)
_VGG_PLAN = [
    (64, False), (64, False),          # stage 1 -> relu1_2
    (128, True), (128, False),         # stage 2 -> relu2_2
    (256, True), (256, False), (256, False),   # stage 3 -> relu3_3
    (512, True), (512, False), (512, False),   # stage 4 -> relu4_3
    (512, True), (512, False), (512, False),   # stage 5 -> relu5_3
]
_STAGE_ENDS = [1, 3, 6, 9, 12]
_STAGE_CHANNELS = [64, 128, 256, 512, 512]

# ImageNet normalization used by lpips (scaling_layer shift/scale)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPSParams(NamedTuple):
    convs: tuple      # tuple of {"w": [kh,kw,cin,cout], "b": [cout]}
    lins: tuple       # tuple of [C] per stage (1x1 linear head weights)


def init_lpips(key=None, weights_file: str | None = None) -> LPIPSParams:
    if weights_file is not None:
        data = np.load(weights_file)
        convs = []
        for i in range(len(_VGG_PLAN)):
            convs.append({
                "w": jnp.asarray(data[f"conv{i}_w"]),
                "b": jnp.asarray(data[f"conv{i}_b"]),
            })
        lins = tuple(jnp.asarray(data[f"lin{i}"]) for i in range(5))
        return LPIPSParams(convs=tuple(convs), lins=lins)

    key = key if key is not None else jax.random.PRNGKey(0)
    return _init_random_backbone(key)


@jax.jit
def _init_random_backbone(key) -> LPIPSParams:
    """Deterministic He-init random VGG in ONE jitted program (the eager
    per-layer form paid a tunnel round trip per op on remote backends)."""
    convs = []
    cin = 3
    for i, (cout, _) in enumerate(_VGG_PLAN):
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (3, 3, cin, cout)) * np.sqrt(
            2.0 / (3 * 3 * cin)
        )
        convs.append({"w": w, "b": jnp.zeros((cout,))})
        cin = cout
    lins = tuple(
        jnp.full((c,), 1.0 / c, jnp.float32) for c in _STAGE_CHANNELS
    )
    return LPIPSParams(convs=tuple(convs), lins=lins)


def export_torch_weights(out_path: str, vgg_state: dict, lin_state: dict):
    """Convert torchvision VGG16 `features` state_dict + lpips lin heads to
    the .npz this module loads. (Utility for environments with the weights.)
    """
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    arrs = {}
    for i, cid in enumerate(conv_ids):
        w = np.asarray(vgg_state[f"features.{cid}.weight"])
        arrs[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0))
        arrs[f"conv{i}_b"] = np.asarray(vgg_state[f"features.{cid}.bias"])
    for i in range(5):
        lin = np.asarray(lin_state[f"lin{i}.model.1.weight"])
        arrs[f"lin{i}"] = lin.reshape(-1)
    np.savez(out_path, **arrs)


def _conv(x, p):
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"].astype(x.dtype)


_STAGE_STARTS = [0, 2, 4, 7, 10]


def _run_convs_strips(x, convs, n_strips: int):
    """Run consecutive 3x3-SAME convs (+relu) via halo'd H-strips.

    Manual space-to-batch: [N, H, W, C] -> [N*n_strips, H/n_strips + 2*halo,
    W, C] where halo = number of chained convs, each conv VALID-in-H against
    the pre-padded halo (zero image borders via jnp.pad == SAME). Numerically
    EXACT vs the SAME-conv chain. Purpose: inside a large jitted module XLA
    stops space-to-batch-splitting the early VGG stages on its own (the
    [2, 384, 384, 64] batch-tiled layouts run 3-4x slower than the spatial-
    split form it picks standalone) — splitting by hand pins the fast form.
    """
    n, H, W, cin = x.shape
    h = len(convs)
    s = H // n_strips
    xp = jnp.pad(x, ((0, 0), (h, h), (0, 0), (0, 0)))
    rows = (
        jnp.arange(n_strips, dtype=jnp.int32)[:, None] * s
        + jnp.arange(s + 2 * h, dtype=jnp.int32)[None, :]
    )
    strips = xp[:, rows]                       # [n, n_strips, s+2h, W, C]
    strips = strips.reshape(n * n_strips, s + 2 * h, W, cin)
    for j, p in enumerate(convs):
        strips = jax.lax.conv_general_dilated(
            strips, p["w"].astype(strips.dtype), (1, 1),
            ((0, 0), (1, 1)),                  # VALID in H (halo), SAME in W
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["b"].astype(strips.dtype)
        strips = jax.nn.relu(strips)
        rem = h - (j + 1)                      # halo rows still carried
        if rem > 0:
            # SAME re-pads with zeros at EVERY conv: halo rows that fall
            # outside the image must be zeroed before the next conv (they
            # now hold relu(bias)-contaminated values, not zeros).
            rows_g = (
                jnp.arange(n_strips, dtype=jnp.int32)[:, None] * s - rem
                + jnp.arange(s + 2 * rem, dtype=jnp.int32)[None, :]
            )
            ok = jnp.tile((rows_g >= 0) & (rows_g < H), (n, 1))
            strips = jnp.where(ok[:, :, None, None], strips, 0)
    return strips.reshape(n, n_strips * s, W, -1)


def _features(
    params: LPIPSParams, x: jnp.ndarray,
    strips: tuple = (16, 8, 0, 0, 0),
) -> list:
    """x: [N, H, W, 3] in [0, 1] -> list of 5 stage activations.

    The VGG trunk runs in bf16 (the MXU's native rate, half the HBM traffic
    of fp32); stage activations are returned as f32 for the unit-normalize /
    distance math. A perceptual distance tolerates bf16 features.

    strips[i] > 1 routes stage i through `_run_convs_strips` (exact); 0
    keeps the plain SAME-conv chain. Defaults split the two high-resolution
    stages, where the layout regression lives.
    """
    x = x * 2.0 - 1.0                                   # lpips takes [-1, 1]
    x = ((x - _SHIFT) / _SCALE).astype(jnp.bfloat16)
    feats = []
    for si, (start, end) in enumerate(zip(_STAGE_STARTS, _STAGE_ENDS)):
        if si > 0:
            # reduce_window maxpool. (A reshape+max formulation was measured
            # SLOWER here despite its simpler VJP — 11.3 vs 9.6 ms for the
            # train-step-shaped fwd+bwd — XLA's select-and-scatter lowering
            # wins at these layouts.)
            x = jax.lax.reduce_window(
                x, x.dtype.type(-jnp.inf), jax.lax.max,
                (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        convs = params.convs[start:end + 1]
        ns = strips[si] if si < len(strips) else 0
        H = x.shape[1]
        if ns > 1 and H % ns == 0 and H // ns >= len(convs):
            x = _run_convs_strips(x, convs, ns)
        else:
            for p in convs:
                x = jax.nn.relu(_conv(x, p))
        feats.append(x.astype(jnp.float32))
    return feats


def lpips_distance(
    params: LPIPSParams, img1: jnp.ndarray, img2: jnp.ndarray,
    strips: tuple = (16, 8, 0, 0, 0),
) -> jnp.ndarray:
    """img: [H, W, 3] or [N, H, W, 3] in [0, 1] -> scalar (or [N])."""
    squeeze = img1.ndim == 3
    if squeeze:
        img1, img2 = img1[None], img2[None]
    # Two separate trunk passes, NOT one batched pass: img2 is a constant
    # (the GT crop), so AD builds the backward only for img1's trunk.
    # Concatenating would drag the constant half through the backward convs
    # (measured 2x slower at the train-step shape).
    f1 = _features(params, img1, strips=strips)
    f2 = _features(params, img2, strips=strips)
    total = 0.0
    for a, b, lin in zip(f1, f2, params.lins):
        a = a * jax.lax.rsqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
        b = b * jax.lax.rsqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
    return total[0] if squeeze else total


class LPIPS:
    """Convenience wrapper: `lpips = LPIPS(); lpips(img1, img2)`.

    `metric_name` is the honest report key: "lpips" only when pretrained
    weights were loaded; the deterministic random-VGG fallback reports as
    "lpips_rand" so its numbers are never mistaken for published LPIPS.
    """

    def __init__(self, weights_file: str | None = None, key=None):
        self.params = init_lpips(key=key, weights_file=weights_file)
        self.pretrained = weights_file is not None
        self.metric_name = "lpips" if self.pretrained else "lpips_rand"
        self._fn = jax.jit(functools.partial(lpips_distance, self.params))

    def __call__(self, img1, img2):
        return self._fn(img1, img2)
