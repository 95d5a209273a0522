"""Latent BRDF autoencoder MLP.

Parity: nets/brdf_network.py (62 LoC) — shipped by the reference but
instantiated nowhere (scene/gaussian_model.py:102-104 commented); albedo and
roughness are direct per-Gaussian parameters instead. Provided for API
completeness: a per-Gaussian 32-dim latent decoded to (albedo 3, roughness 1,
specular tint 3) through a small MLP, with the sparsity KL loss the
reference's get_kl_loss (utils/loss_utils.py) would consume.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

LATENT_DIM = 32


def init_brdf_mlp(key, latent_dim: int = LATENT_DIM, width: int = 64):
    k1, k2, k3 = jax.random.split(key, 3)

    def lin(k, i, o):
        bound = (6.0 / (i + o)) ** 0.5
        return {"w": jax.random.uniform(k, (i, o), jnp.float32, -bound, bound),
                "b": jnp.zeros((o,), jnp.float32)}

    return {
        "l1": lin(k1, latent_dim, width),
        "l2": lin(k2, width, width),
        "head": lin(k3, width, 7),
    }


def apply_brdf_mlp(params, latent: jnp.ndarray) -> dict:
    """[N, latent] -> {"albedo" [N,3], "roughness" [N,1], "specular" [N,3]}."""
    h = jax.nn.relu(latent @ params["l1"]["w"] + params["l1"]["b"])
    h = jax.nn.relu(h @ params["l2"]["w"] + params["l2"]["b"])
    out = h @ params["head"]["w"] + params["head"]["b"]
    return {
        "albedo": jax.nn.sigmoid(out[..., 0:3]),
        "roughness": jax.nn.sigmoid(out[..., 3:4]),
        "specular": jax.nn.sigmoid(out[..., 4:7]),
    }


def latent_kl_loss(latent: jnp.ndarray, rho: float = 0.05) -> jnp.ndarray:
    """Sparsity KL on the latent activations (loss_utils.py get_kl_loss)."""
    rho_hat = jnp.mean(jax.nn.sigmoid(latent), axis=0)
    rho_hat = jnp.clip(rho_hat, 1e-6, 1 - 1e-6)
    return jnp.mean(
        rho * jnp.log(rho / rho_hat)
        + (1 - rho) * jnp.log((1 - rho) / (1 - rho_hat))
    )
