"""Orbax checkpointing of the full training state.

Replaces the reference's artifact spread — parl agent.save(.pt) +
np.savez ETG (w,b,param) per eval window (train.py:386-390), torch.load
restore (mujoco_agent.py:61-65) — with one Orbax checkpoint tree:
(SAC params/opt state, ES solver state, ETG (w,b), replay buffer
counters, RNG key, step counters).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save(path: str, tree: Any, step: int):
    """Save a PyTree checkpoint at `path/itr_<step>` (cf. train.py:386)."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    target = os.path.join(path, f"itr_{step}")
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(target, tree, force=True)
        ckptr.wait_until_finished()
    else:  # numpy fallback
        flat, treedef = jax.tree.flatten(tree)
        np.savez(target + ".npz", treedef=str(treedef),
                 **{f"a{i}": np.asarray(x) for i, x in enumerate(flat)})
    return target


def restore(target: str, template: Any) -> Any:
    """Restore a checkpoint saved by `save` into the template's structure."""
    if _HAVE_ORBAX and os.path.isdir(target):
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(target, template)
    data = np.load(target + ".npz", allow_pickle=True)
    flat, treedef = jax.tree.flatten(template)
    restored = [data[f"a{i}"] for i in range(len(flat))]
    return jax.tree.unflatten(jax.tree.structure(template), restored)


def latest_step(path: str) -> int | None:
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("itr_"):
            try:
                steps.append(int(name[4:].split(".")[0]))
            except ValueError:
                pass
    return max(steps) if steps else None
