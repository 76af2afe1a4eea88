"""Device-mesh sharding for the quadruped training stack.

TPU-native replacement for the reference's three distributed transports
(SURVEY §2.3): xparl actor RPC for ES rollouts
(Dynamic_parallel_model.py:95-99), Paddle Fleet NCCL allreduce
(train_attention_controller.py:393-404), and mp dataloader fleets — all
become XLA collectives compiled from sharding annotations:

- **env axis (dp)**: the batch-minor env state (leaves shaped (..., B))
  shards its LAST axis across devices; every env-step op is elementwise
  over B, so stepping needs NO communication at all — each chip
  integrates its own slice of envs over ICI-free fused kernels.
- **model axis (tp)**: Dense kernels of actor/critic shard their output
  feature axis; XLA inserts the psum for the row-parallel second layer.
- **gradient reduction**: SAC learns on a per-chip replay shard;
  gradients are psum'd by XLA because params are replicated while the
  batch is sharded (exactly Fleet's allreduce, compiled).
- **ES population**: candidates ride the env axis (each candidate's env
  slice lives on one chip), fitness reduction is one all-gather.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_env: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Mesh with ('env', 'model') axes; defaults to all devices on env."""
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_env is None:
        n_env = n_total // n_model
    assert n_env * n_model == n_total, (n_env, n_model, n_total)
    arr = np.asarray(devices).reshape(n_env, n_model)
    return Mesh(arr, ("env", "model"))


def shard_env_state(mesh: Mesh, tree: Any) -> Any:
    """Place every leaf with its LAST axis sharded over the env axis
    (batch-minor layout ⇒ the batch is the last axis everywhere)."""

    def place(x):
        x = jnp.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = [None] * (x.ndim - 1) + ["env"]
        # guard: only shard if divisible
        if x.shape[-1] % mesh.shape["env"] != 0:
            spec = [None] * x.ndim
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(place, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    return jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), NamedSharding(mesh, P())),
        tree)


def shard_params_tp(mesh: Mesh, params: Any) -> Any:
    """Tensor-parallel placement of MLP params: alternate column-/row-
    parallel Dense layers over the 'model' axis (Megatron layout); bias
    follows the kernel's output sharding."""
    n_model = mesh.shape["model"]

    def place(path, x):
        x = jnp.asarray(x)
        name = "/".join(str(p.key) if hasattr(p, "key") else str(p)
                        for p in path)
        if n_model == 1 or x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        if x.ndim == 2 and x.shape[-1] % n_model == 0 and "kernel" in name:
            # column-parallel: shard output features
            return jax.device_put(x, NamedSharding(mesh, P(None, "model")))
        if x.ndim == 1 and x.shape[-1] % n_model == 0 and "bias" in name:
            return jax.device_put(x, NamedSharding(mesh, P("model")))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_replay(mesh: Mesh, buf: Any) -> Any:
    """Replay buffer rows sharded over 'env' (each chip keeps its own
    slice; sampling stays chip-local, gradient psum merges learning)."""

    def place(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] % mesh.shape["env"] == 0:
            spec = ["env"] + [None] * (x.ndim - 1)
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, buf)
