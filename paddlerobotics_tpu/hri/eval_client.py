"""Offline evaluation: batch-of-frames scoring + threshold sweeps.

Rebuild of the C++ EvalServer batch scorer (jetson/eval_v3.cpp,
eval_server.proto: EvalRequest{nframe, frames} → scores) and the Python
sweep client (jetson/parallel_eval.py:26-543). The multi-GPU/process
fan-out becomes a vmapped batch over windows on one chip.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class OfflineEvaluator:
    def __init__(self, service):
        """service: ProactiveGreetingService (reuses its jitted programs)."""
        self.svc = service

    def score_windows(self, token_windows: np.ndarray,
                      valid_windows: np.ndarray) -> np.ndarray:
        """token_windows (N, F, K, 562) → trigger score per window (N,)."""
        N, F, K, D = token_windows.shape
        tokens = jnp.asarray(token_windows).reshape(N, F * K, D)
        valid = jnp.asarray(valid_windows).reshape(N, F * K).astype(
            jnp.float32)
        frame_ids = jnp.repeat(jnp.arange(1, F + 1), K)[None].repeat(N, 0)
        out = self.svc._attend(self.svc.ctrl_params, tokens, frame_ids,
                               valid)
        return np.asarray(jax.nn.sigmoid(out["trigger_logits"][:, -1]))

    def sweep_thresholds(self, scores: np.ndarray, labels: np.ndarray,
                         thresholds: Sequence[float] = tuple(
                             np.arange(0.5, 0.96, 0.05))
                         ) -> List[Dict[str, float]]:
        """Precision/recall per threshold (parallel_eval.py sweep)."""
        rows = []
        for th in thresholds:
            pred = scores >= th
            tp = float(np.sum(pred & (labels > 0.5)))
            fp = float(np.sum(pred & (labels <= 0.5)))
            fn = float(np.sum(~pred & (labels > 0.5)))
            prec = tp / max(tp + fp, 1e-9)
            rec = tp / max(tp + fn, 1e-9)
            rows.append({"threshold": round(float(th), 3),
                         "precision": prec, "recall": rec,
                         "f1": 2 * prec * rec / max(prec + rec, 1e-9)})
        return rows
