"""Shipped per-task ETG seed artifacts.

The reference ships well-trained ETG/policy artifacts for its nine
tasks and seeds training via ``--ETG_path``
(QuadrupedalRobots/ETGRL/README.md:77; train.py:281-295 loads the npz
``param``). This module is the equivalent library: small npz files
(``w``, ``b``, ``param`` — the cli/pretrain_etg.py artifact layout)
committed under ``assets/etg_seeds/<task_mode>.npz`` and resolved
automatically by the training CLI when ``--ETG_path auto`` (the
default).

Seeds are shipped only for tasks where they are load-bearing
(docs/task_matrix.md: the uphill modes' flat-ground ETG prior is the
cold-start limiter; stairs benefits under full-range DR). Tasks without
a shipped seed start from the zero-offset prior exactly as before.

Round-4 caveat: these seeds are ES starting points / replay
bootstraps, NOT open-loop-stable gaits — measured open-loop under the
current (round-3 latency-exact) physics every seed falls within 12–42
steps. That is fine where the seed's role is to bias exploration
(uphill, stairs: measurably load-bearing), but it poisoned the
balance-beam warmup, where the DEFAULT prior is the better bootstrap —
the beam preset therefore sets ``ETG_path='None'`` and the shipped
``balance_beam.npz`` is retained only for provenance
(docs/task_matrix.md "round-4 close").
"""

from __future__ import annotations

import os

import numpy as np

SEED_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "etg_seeds")


def seed_path(task_mode: str) -> str | None:
    """Path of the shipped seed npz for `task_mode`, or None."""
    p = os.path.join(SEED_DIR, f"{task_mode}.npz")
    return p if os.path.exists(p) else None


def load_seed_param(task_mode: str) -> np.ndarray | None:
    """The 12 control-point offsets ("param") for `task_mode`, or None
    when no seed is shipped (zero-offset prior applies)."""
    p = seed_path(task_mode)
    if p is None:
        return None
    return np.load(p)["param"].reshape(-1)


def available() -> list[str]:
    if not os.path.isdir(SEED_DIR):
        return []
    return sorted(f[:-4] for f in os.listdir(SEED_DIR)
                  if f.endswith(".npz"))
