"""Learned deformation-correction MLPs as plain param pytrees.

Functional ports of the reference's two trainable nets (SURVEY.md §2.12):
  * BodyPoseRefiner (nets/mlp_delta_body_pose.py): 69 -> 128 -> 128 -> 69,
    last layer init U(+-1e-5) so initial corrections ~ identity, output
    through the regularized Rodrigues -> [23,3,3] correction rotations.
  * LBSOffsetDecoder (nets/mlp_delta_weight_lbs.py): 10-freq positional
    encoding (63 dims) -> width-128 depth-4 MLP with a skip concat at layer
    2 -> per-point 24-dim blend-weight logit offsets.

Plain dict pytrees (not flax modules) keep optimizer param-group surgery and
checkpointing trivial; everything is jit/vmap/grad-transparent.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mygauhuman_tpu.utils.transforms import rodrigues_mlp

POSE_INPUT_DIM = 69  # 23 non-root joints * 3
PE_FREQS = 10
PE_DIM = 3 + 3 * 2 * PE_FREQS  # 63


def _linear_init(key, fan_in, fan_out, gain_relu=True):
    # xavier-uniform with relu gain, matching the reference's initseq
    gain = np.sqrt(2.0) if gain_relu else 1.0
    bound = gain * np.sqrt(3.0 / fan_in)
    wkey, _ = jax.random.split(key)
    w = jax.random.uniform(wkey, (fan_in, fan_out), jnp.float32, -bound, bound)
    return {"w": w, "b": jnp.zeros((fan_out,), jnp.float32)}


def init_pose_refiner(key, total_bones: int = 24, width: int = 128, depth: int = 2):
    """Layers: in->W, (depth-1) x W->W, W->3*(bones-1). Reference widths 128/2."""
    dims = [3 * (total_bones - 1)] + [width] * depth + [3 * (total_bones - 1)]
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for i in range(len(dims) - 1):
        last = i == len(dims) - 2
        p = _linear_init(keys[i], dims[i], dims[i + 1], gain_relu=not last)
        if last:  # tiny init -> identity corrections at start
            p["w"] = jax.random.uniform(
                keys[i], (dims[i], dims[i + 1]), jnp.float32, -1e-5, 1e-5
            )
        layers.append(p)
    return {"layers": layers}


def apply_pose_refiner(params, pose_vec: jnp.ndarray) -> jnp.ndarray:
    """[69] non-root pose -> [23, 3, 3] correction rotations."""
    h = pose_vec
    layers = params["layers"]
    for p in layers[:-1]:
        h = jax.nn.relu(h @ p["w"] + p["b"])
    rvec = (h @ layers[-1]["w"] + layers[-1]["b"]).reshape(-1, 3)
    return rodrigues_mlp(rvec)


def positional_encode(x: jnp.ndarray, freqs: int = PE_FREQS) -> jnp.ndarray:
    """NeRF-style PE: [.., 3] -> [.., 3 + 3*2*freqs], bands 2^0..2^(freqs-1).

    Ordering parity with the reference Embedder: [x, sin(2^0 x), cos(2^0 x),
    sin(2^1 x), ...] interleaved per frequency.
    """
    outs = [x]
    for i in range(freqs):
        outs.append(jnp.sin((2.0**i) * x))
        outs.append(jnp.cos((2.0**i) * x))
    return jnp.concatenate(outs, axis=-1)


def init_lbs_offset(key, total_bones: int = 24, width: int = 128, depth: int = 4,
                    skips: tuple = (2,)):
    dims_in = []
    d_prev = PE_DIM
    layers = []
    keys = jax.random.split(key, depth + 1)
    for i in range(depth):
        layers.append(_linear_init(keys[i], d_prev, width))
        d_prev = width + (PE_DIM if i in skips else 0)
        dims_in.append(d_prev)
    head = _linear_init(keys[-1], d_prev, total_bones, gain_relu=False)
    return {"layers": layers, "head": head}


def apply_lbs_offset(params, pts: jnp.ndarray, skips: tuple = (2,)) -> jnp.ndarray:
    """[N, 3] canonical points -> [N, 24] blend-weight logit offsets.

    Skip semantics parity (mlp_delta_weight_lbs.py:26-32): activation first,
    then concat the PE features after the skip layer's output.
    """
    feat = positional_encode(pts)
    h = feat
    for i, p in enumerate(params["layers"]):
        h = jax.nn.relu(h @ p["w"] + p["b"])
        if i in skips:
            h = jnp.concatenate([feat, h], axis=-1)
    return h @ params["head"]["w"] + params["head"]["b"]
