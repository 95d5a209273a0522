"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests exercise
`jax.sharding.Mesh` semantics on host-platform virtual devices (the driver
separately dry-run-compiles the multi-chip path via __graft_entry__.py).

Note: the environment preloads an `axon` TPU-tunnel PJRT plugin via
sitecustomize (importing jax before we run), so plain JAX_PLATFORMS env vars
are too late — we must use jax.config.update before any backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.device_count() >= 8, "expected 8 virtual CPU devices for sharding tests"
