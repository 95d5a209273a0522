"""Checkpoint / resume: orbax pytree snapshots + PLY export + eval cache.

Replaces the reference's three persistence channels (SURVEY.md §5.4):
  1. full train state  (torch.save(gaussians.capture()) -> chkpnt{it}.pth)
     -> orbax snapshot of the whole TrainState (+ optional PbrState)
  2. model-only PLY    (scene.save -> point_cloud.ply + mlp ckpt)
     -> models/io.save_ply + the MLP params inside the orbax tree
  3. eval cache        (smpl_rot.pickle: per-pose transforms/translation)
     -> npz of the same arrays (render replay skips MLPs + LBS)
Config JSON is written alongside (replaces the cfg_args Namespace file).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

import orbax.checkpoint as ocp

from mygauhuman_tpu.config import Config
from mygauhuman_tpu.train.trainer import TrainState


def save_checkpoint(
    ckpt_dir: str,
    step: int,
    state: Any,
    config: Config | None = None,
) -> str:
    """Snapshot any pytree (TrainState, (TrainState, PbrState), ...)."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"chkpnt{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    if config is not None:
        config.save(os.path.join(os.path.abspath(ckpt_dir), "cfg_args.json"))
    return path


def load_checkpoint(ckpt_dir: str, step: int, target: Any) -> Any:
    """Restore into the structure of `target` (a freshly built state)."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"chkpnt{step}")
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, target=jax.device_get(target))
    return jax.tree_util.tree_map(jax.numpy.asarray, restored)


def restore_checkpoint_like(ckpt_dir: str, step: int, example: Any) -> Any:
    """Restore into `example`'s pytree STRUCTURE with the checkpoint's leaf
    VALUES (shapes may differ, e.g. a capacity grown mid-training).

    This is the `--start_checkpoint` -> gaussians.restore path (reference
    train.py:136-138): StandardCheckpointer.restore with a target refuses
    shape mismatches, so restore raw and re-attach the example's treedef —
    leaf order is deterministic for an identical structure.
    """
    path = os.path.join(os.path.abspath(ckpt_dir), f"chkpnt{step}")
    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(path)

    def rebuild(ex, rw):
        # orbax stores NamedTuples as {field: value} dicts; rebuild the
        # typed structure by field name so leaf ORDER never matters.
        if hasattr(ex, "_fields"):                       # NamedTuple
            vals = [rebuild(getattr(ex, f), rw[f]) for f in ex._fields]
            return type(ex)(*vals)
        if isinstance(ex, dict):
            return {k: rebuild(v, rw[k]) for k, v in ex.items()}
        if isinstance(ex, (list, tuple)):
            rebuilt = [rebuild(e, r) for e, r in zip(ex, rw, strict=True)]
            return type(ex)(rebuilt)
        if rw is None:
            return ex                                    # e.g. None leaves
        return jax.numpy.asarray(rw)

    return rebuild(example, raw)


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("chkpnt"):
            try:
                steps.append(int(name[len("chkpnt"):]))
            except ValueError:
                pass
    return max(steps) if steps else None


# ----------------------------------------------------------------------------
# Eval replay cache (smpl_rot.pickle parity, train.py:548-552)
# ----------------------------------------------------------------------------

EVAL_CACHE_VERSION = 2  # v2: keys are pose ids (never batch indices)


def save_eval_cache(path: str, cache: dict) -> None:
    """cache: {pose_id: {"transforms": [cap,3,3], "translation": [cap,3]}}"""
    flat = {"__version__": np.int32(EVAL_CACHE_VERSION)}
    for pose_id, d in cache.items():
        flat[f"{pose_id}_transforms"] = np.asarray(d["transforms"])
        flat[f"{pose_id}_translation"] = np.asarray(d["translation"])
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_eval_cache(path: str) -> dict:
    """Returns {pose_id: rows}. Versioned: round-1-era caches (no
    `__version__` field) were keyed by batch *index*, a silent
    wrong-transform hazard when an index collides with a real pose id —
    they are rejected with a re-run instruction instead of misread."""
    data = np.load(path)
    if "__version__" not in data.files:
        raise ValueError(
            f"{path} is an unversioned (round-1-era, index-keyed) replay "
            "cache; re-run training to regenerate a pose-keyed cache")
    cache: dict = {}
    for key in data.files:
        if key == "__version__":
            continue
        pose_id, kind = key.rsplit("_", 1)
        cache.setdefault(pose_id, {})[kind] = data[key]
    return cache
