"""Training observability: JSONL metric stream + optional TensorBoard.

Replaces the reference's tqdm-EMA + TensorBoard scalars/histograms/image
grids (train.py:288-291,348-349,379-386,458-556; SURVEY.md §5.5). The JSONL
stream is the primary channel (machine-readable training-health record:
losses, per-phase Gaussian counts, densify events); TensorBoard mirrors it
when `torch.utils.tensorboard` is importable.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any


class MetricLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None
        self._t0 = time.time()
        self._ema: dict = {}

    def log(self, step: int, metrics: dict, prefix: str = "train") -> None:
        record: dict[str, Any] = {
            "step": step,
            "wall_s": round(time.time() - self._t0, 3),
        }
        try:
            # ONE device->host transfer for the whole dict (per-scalar
            # float() pays a full dispatch round trip each in a
            # remote-device environment)
            import jax

            metrics = jax.device_get(metrics)
        except Exception:
            pass
        for k, v in metrics.items():
            v = float(v)
            record[f"{prefix}/{k}"] = v
            # 0.6/0.4 EMA like the reference progress bar (train.py:380-381)
            self._ema[k] = 0.6 * v + 0.4 * self._ema.get(k, v)
            if self._tb is not None:
                self._tb.add_scalar(f"{prefix}/{k}", v, step)
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()

    def log_image(self, step: int, tag: str, image) -> None:
        if self._tb is not None:
            import numpy as np

            arr = np.asarray(image)
            if arr.ndim == 3 and arr.shape[-1] in (1, 3):
                arr = arr.transpose(2, 0, 1)
            self._tb.add_image(tag, arr, step)

    @property
    def ema(self) -> dict:
        return dict(self._ema)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
