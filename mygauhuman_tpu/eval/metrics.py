"""Offline metrics: PSNR / SSIM / LPIPS over render galleries.

Parity: metrics.py:44-101 — walk (renders, gt) image pairs, compute the
three metrics, emit per-image and mean results as JSON.
"""
from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from mygauhuman_tpu.eval.lpips import LPIPS
from mygauhuman_tpu.train.losses import psnr, ssim


def evaluate_images(
    renders: list,            # list of [H, W, 3] float arrays in [0, 1]
    gts: list,
    names: list | None = None,
    lpips_model: LPIPS | None = None,
) -> dict:
    lpips_model = lpips_model or LPIPS()
    # Honest key: "lpips" only with pretrained weights; "lpips_rand" for the
    # deterministic random-VGG backbone (not comparable to published LPIPS).
    lkey = getattr(lpips_model, "metric_name", "lpips")
    names = names or [str(i) for i in range(len(renders))]
    per_image = {}
    psnrs, ssims, lpipss = [], [], []
    for name, r, g in zip(names, renders, gts):
        r = jnp.asarray(r, jnp.float32)
        g = jnp.asarray(g, jnp.float32)
        p = float(psnr(r, g))
        s = float(ssim(r, g))
        l = float(lpips_model(r, g))
        per_image[name] = {"psnr": p, "ssim": s, lkey: l}
        psnrs.append(p)
        ssims.append(s)
        lpipss.append(l)
    return {
        "psnr": float(np.mean(psnrs)) if psnrs else 0.0,
        "ssim": float(np.mean(ssims)) if ssims else 0.0,
        lkey: float(np.mean(lpipss)) if lpipss else 0.0,
        "per_image": per_image,
    }


def evaluate_dirs(renders_dir: str, gt_dir: str, out_json: str | None = None) -> dict:
    """Directory mode like the reference metrics.py CLI."""
    import imageio.v2 as imageio

    names = sorted(os.listdir(renders_dir))
    renders, gts = [], []
    for n in names:
        renders.append(
            imageio.imread(os.path.join(renders_dir, n)).astype(np.float32)
            / 255.0
        )
        gts.append(
            imageio.imread(os.path.join(gt_dir, n)).astype(np.float32) / 255.0
        )
    result = evaluate_images(renders, gts, names)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f, indent=2)
    return result
