"""Learnable cubemap environment light (reference CubemapLight,
pbr/light.py:57-149) as a functional param-pytree + pure helpers.

State is {"base": [6, R, R, 3]} (trainable). `build_mips` derives the
diffuse irradiance map and the GGX-prefiltered specular chain:
  specular[0..n-2]: roughness ramp MIN..MAX over the avg-pool mip chain
  specular[n-1]:    roughness 1.0 at LIGHT_MIN_RES
matching build_mips (pbr/light.py:103-117); `get_mip` maps roughness to a
fractional mip level (pbr/light.py:91-101).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mygauhuman_tpu.pbr.cubemap import (
    avg_pool_cubemap,
    cubemap_to_latlong,
)
from mygauhuman_tpu.pbr.prefilter import diffuse_cubemap, specular_cubemap

LIGHT_MIN_RES = 8
MIN_ROUGHNESS = 0.08
MAX_ROUGHNESS = 0.5


class CubemapLight(NamedTuple):
    """Derived light maps produced by build_mips (not trainable state)."""

    diffuse: jnp.ndarray           # [6, R, R, 3]
    specular: tuple                # tuple of [6, r, r, 3], descending res


def init_cubemap_light(base_res: int = 32, init_value: float = 0.5) -> dict:
    """Trainable light params. Parity: train.py:150 (CubemapLight(base_res=32)
    with uniform 0.5 init)."""
    return {"base": jnp.full((6, base_res, base_res, 3), init_value,
                             jnp.float32)}


def clamp_light(params: dict, min_value: float = 0.0,
                max_value: float | None = None) -> dict:
    """Post-step projection (reference clamp_, train.py:423)."""
    base = jnp.maximum(params["base"], min_value)
    if max_value is not None:
        base = jnp.minimum(base, max_value)
    return {"base": base}


def num_levels(base_res: int) -> int:
    n = 1
    while base_res > LIGHT_MIN_RES:
        base_res //= 2
        n += 1
    return n


def build_mips(params: dict) -> CubemapLight:
    """Avg-pool chain + GGX prefilter per level + cosine diffuse."""
    chain = [params["base"]]
    while chain[-1].shape[1] > LIGHT_MIN_RES:
        chain.append(avg_pool_cubemap(chain[-1]))
    diffuse = diffuse_cubemap(chain[0])
    n = len(chain)
    specular = []
    for idx in range(n - 1):
        roughness = (idx / max(n - 2, 1)) * (MAX_ROUGHNESS - MIN_ROUGHNESS) \
            + MIN_ROUGHNESS
        specular.append(specular_cubemap(chain[idx], roughness))
    specular.append(specular_cubemap(chain[-1], 1.0))
    return CubemapLight(diffuse=diffuse, specular=tuple(specular))


def get_mip(roughness: jnp.ndarray, n_levels: int) -> jnp.ndarray:
    """Roughness -> fractional specular mip level (pbr/light.py:91-101)."""
    low = (
        (jnp.clip(roughness, MIN_ROUGHNESS, MAX_ROUGHNESS) - MIN_ROUGHNESS)
        / (MAX_ROUGHNESS - MIN_ROUGHNESS)
        * (n_levels - 2)
    )
    high = (
        (jnp.clip(roughness, MAX_ROUGHNESS, 1.0) - MAX_ROUGHNESS)
        / (1.0 - MAX_ROUGHNESS)
        + n_levels
        - 2
    )
    return jnp.where(roughness < MAX_ROUGHNESS, low, high)


def export_envmap(params: dict, height: int = 256, width: int = 512) -> jnp.ndarray:
    """Lat-long render of the base cubemap (pbr/light.py:119-149)."""
    return cubemap_to_latlong(params["base"], height, width)
