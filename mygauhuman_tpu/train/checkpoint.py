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

def save_eval_cache(path: str, cache: dict) -> None:
    """cache: {pose_id: {"transforms": [cap,3,3], "translation": [cap,3]}}"""
    flat = {}
    for pose_id, d in cache.items():
        flat[f"{pose_id}_transforms"] = np.asarray(d["transforms"])
        flat[f"{pose_id}_translation"] = np.asarray(d["translation"])
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_eval_cache(path: str) -> dict:
    data = np.load(path)
    cache: dict = {}
    for key in data.files:
        pose_id, kind = key.rsplit("_", 1)
        cache.setdefault(pose_id, {})[kind] = data[key]
    return cache
