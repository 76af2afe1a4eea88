"""Metrics logging: JSONL + optional TensorBoard.

Replaces parl.utils.logger/summary (train.py:359-366) with a JSONL
stream (always) and TensorBoard scalars when `tensorboardX` or
`torch.utils.tensorboard` is importable. Scalar names mirror the
reference's (train/episode_reward, train/episode_<channel>, ES/sigma…)
so dashboards line up.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, outdir: str, use_tensorboard: bool = True):
        os.makedirs(outdir, exist_ok=True)
        self.path = os.path.join(outdir, "metrics.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(os.path.join(outdir, "tb"))
            except Exception:
                self._tb = None
        self._t0 = time.time()

    def add_scalar(self, tag: str, value: float, step: int):
        self._f.write(json.dumps({
            "tag": tag, "value": float(value), "step": int(step),
            "t": round(time.time() - self._t0, 3)}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def add_scalars(self, prefix: str, scalars: dict, step: int):
        for k, v in scalars.items():
            self.add_scalar(f"{prefix}/{k}", v, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
