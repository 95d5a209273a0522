"""Gaussian scene <-> PLY interop (reference save_ply/load_ply,
scene/gaussian_model.py:309-407).

Attribute layout parity: x,y,z, nx,ny,nz, ar,ag,ab, roughness, f_dc_*,
f_rest_* (channel-major: all of channel 0's rest coeffs, then channel 1, ...),
opacity, scale_0..2, rot_0..3 — so PLYs round-trip with the reference tooling.
Only alive Gaussians are written; loading re-pads to a power-of-two capacity.
"""
from __future__ import annotations

import numpy as np

from mygauhuman_tpu.models.gaussians import (
    GaussianParams,
    GaussianState,
    _round_capacity,
)
from mygauhuman_tpu.utils.ply import read_ply, write_ply

import jax.numpy as jnp


def save_ply(state: GaussianState, path: str) -> None:
    alive = np.asarray(state.alive)
    p = state.params

    def take(x):
        return np.asarray(x)[alive]

    xyz = take(p.xyz)
    normal = take(p.normal)
    albedo = take(p.albedo)
    rough = take(p.roughness)
    f_dc = take(p.features_dc).transpose(0, 2, 1).reshape(xyz.shape[0], -1)
    f_rest = take(p.features_rest).transpose(0, 2, 1).reshape(xyz.shape[0], -1)
    opac = take(p.opacity)
    scale = take(p.scaling)
    rot = take(p.rotation)

    names = (
        ["x", "y", "z", "nx", "ny", "nz", "ar", "ag", "ab", "roughness"]
        + [f"f_dc_{i}" for i in range(f_dc.shape[1])]
        + [f"f_rest_{i}" for i in range(f_rest.shape[1])]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    cols = np.concatenate(
        [xyz, normal, albedo, rough, f_dc, f_rest, opac, scale, rot], axis=1
    )
    write_ply(path, names, cols)


def load_ply(path: str, sh_degree: int = 3) -> GaussianState:
    d = read_ply(path)
    n = d["x"].shape[0]
    cap = _round_capacity(n)
    rest_total = ((sh_degree + 1) ** 2 - 1) * 3

    def cols(prefix, count):
        return np.stack([d[f"{prefix}{i}"] for i in range(count)], axis=1)

    xyz = np.stack([d["x"], d["y"], d["z"]], axis=1)
    normal = np.stack([d["nx"], d["ny"], d["nz"]], axis=1)
    albedo = np.stack([d["ar"], d["ag"], d["ab"]], axis=1)
    rough = d["roughness"][:, None]
    f_dc = cols("f_dc_", 3).reshape(n, 3, 1).transpose(0, 2, 1)
    f_rest = (
        cols("f_rest_", rest_total)
        .reshape(n, 3, rest_total // 3)
        .transpose(0, 2, 1)
    )
    opac = d["opacity"][:, None]
    scale = cols("scale_", 3)
    rot = cols("rot_", 4)

    def pad(x, fill=0.0):
        shape = (cap - n,) + x.shape[1:]
        return jnp.concatenate(
            [jnp.asarray(x, jnp.float32), jnp.full(shape, fill, jnp.float32)],
            axis=0,
        )

    params = GaussianParams(
        xyz=pad(xyz),
        features_dc=pad(f_dc),
        features_rest=pad(f_rest),
        scaling=pad(scale, fill=-10.0),
        rotation=pad(rot).at[n:, 0].set(1.0),
        opacity=pad(opac, fill=-10.0),
        normal=pad(normal),
        albedo=pad(albedo),
        roughness=pad(rough),
    )
    zeros = jnp.zeros((cap,), jnp.float32)
    return GaussianState(
        params=params,
        alive=jnp.arange(cap) < n,
        smpl_normal=pad(normal),
        xyz_grad_accum=zeros,
        denom=zeros,
        max_radii2d=zeros,
    )
