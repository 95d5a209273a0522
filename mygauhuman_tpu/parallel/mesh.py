"""Device mesh + sharding specs for multi-chip training.

The reference is single-GPU/single-process (SURVEY.md §2.9) — this module is
the TPU-native scaling design with no reference analogue:

  * mesh axes ("data", "gauss"): frames batch-parallel over "data" (DCN-
    friendly), per-Gaussian arrays sharded over "gauss" (ICI collectives).
  * per-Gaussian work (deform, preprocess, covariance, SH) is embarrassingly
    parallel over the sharded capacity axis — no communication.
  * the tile sort/binning and blend run under GSPMD: XLA inserts the
    all-gathers for the tile x Gaussian instance exchange and psum-scatters
    gradients back to the sharded Gaussians, overlapping with tile work
    (scaling-book recipe: annotate shardings, let XLA place collectives).
  * MLPs and optimizer scalars replicate; Adam moments follow their params.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up (SURVEY §5.8): one jax.distributed.initialize
    per process; afterwards jax.devices() spans every host and the meshes
    below place the "data" axis across hosts (DCN) and the model axes
    within a host's ICI domain. No-ops on a single process with no
    coordinator (the single-host path needs no init).
    """
    if coordinator_address is None and num_processes in (None, 1):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_hybrid_mesh(
    axis_names: tuple = ("data", "gauss", "tiles"),
    per_host_shape: tuple | None = None,
) -> Mesh:
    """DCN-aware mesh: "data" (frame parallelism — the only axis whose
    collectives are a once-per-step gradient psum) spans hosts over DCN;
    the raster axes ("gauss", "tiles" — all_to_all instance exchange +
    all_gather every frame) stay inside a host's ICI domain.

    Uses mesh_utils.create_hybrid_device_mesh when multiple processes are
    attached; degenerates to make_mesh on one host."""
    import jax.experimental.mesh_utils as mesh_utils

    n_hosts = jax.process_count()
    n_local = jax.local_device_count()
    if per_host_shape is None:
        # split local devices evenly between the two raster axes
        g = 1
        while n_local % (g * 2) == 0 and g * 2 <= n_local // (g * 2):
            g *= 2
        per_host_shape = (1, g, n_local // g)
    if n_hosts == 1:
        arr = np.asarray(jax.devices()).reshape(per_host_shape)
        return Mesh(arr, axis_names)
    dcn_shape = (n_hosts,) + (1,) * (len(per_host_shape) - 1)
    # process_is_granule: one granule per host process. TPU pods also set a
    # slice_index, but a multi-host run of THIS framework always maps one
    # process per host/slice, and CPU validation clusters have no
    # slice_index at all — process is the right DCN granule for both.
    devices = mesh_utils.create_hybrid_device_mesh(
        per_host_shape, dcn_shape, devices=jax.devices(),
        process_is_granule=True,
    )
    # hybrid mesh returns [data*host, gauss, tiles]-shaped device array
    return Mesh(devices, axis_names)


def make_mesh(
    n_data: int | None = None,
    n_gauss: int | None = None,
    devices: list | None = None,
) -> Mesh:
    """Build a ("data", "gauss") mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None and n_gauss is None:
        n_data = 1
        n_gauss = n
    elif n_data is None:
        n_data = n // n_gauss
    elif n_gauss is None:
        n_gauss = n // n_data
    assert n_data * n_gauss == n, (n_data, n_gauss, n)
    arr = np.asarray(devices).reshape(n_data, n_gauss)
    return Mesh(arr, ("data", "gauss"))


def state_sharding(mesh: Mesh, tree: Any, capacity: int):
    """Sharding pytree for a TrainState/GaussianState-shaped tree: leaves on
    a per-Gaussian path (`gauss`/`gaussians` subtrees) with leading dim ==
    capacity shard over "gauss"; everything else (incl. MLP layers, whose
    width can equal a small capacity) replicates."""
    from mygauhuman_tpu.train.optim import is_gaussian_path

    gauss = NamedSharding(mesh, P("gauss"))
    rep = NamedSharding(mesh, P())
    # a bare GaussianState/GaussianParams tree has no `gauss` ancestor —
    # treat every leaf as per-Gaussian then
    bare = not any(
        is_gaussian_path(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(tree)
    )

    def spec(path, leaf):
        if (hasattr(leaf, "shape") and leaf.ndim >= 1
                and leaf.shape[0] == capacity
                and (bare or is_gaussian_path(path))):
            return gauss
        return rep

    return jax.tree_util.tree_map_with_path(spec, tree)


def batch_sharding(mesh: Mesh, tree: Any):
    """Shard a leading batch dim over "data"; scalars replicate."""
    data = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def spec(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1:
            return data
        return rep

    return jax.tree_util.tree_map(spec, tree)


def shard_tree(mesh: Mesh, tree: Any, sharding_tree: Any):
    """Device-put a pytree to its shardings."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), tree, sharding_tree
    )
