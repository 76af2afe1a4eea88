"""Actor/critic networks matching the reference architecture.

Rebuild of model/mujoco_model.py: Actor = 2×256 ReLU MLP with mean and
clamped log-std heads (LOG_SIG_MIN/MAX −20/2, mujoco_model.py:21-22);
Critic = twin Q MLPs on concat(obs, act) (mujoco_model.py:63-89).
Flax linen; bfloat16-friendly widths (256 = 2×128 MXU lanes).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

LOG_SIG_MIN = -20.0
LOG_SIG_MAX = 2.0


class Actor(nn.Module):
    action_dim: int
    hidden: int = 256

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = nn.relu(nn.Dense(self.hidden)(obs))
        x = nn.relu(nn.Dense(self.hidden)(x))
        mean = nn.Dense(self.action_dim)(x)
        log_std = nn.Dense(self.action_dim)(x)
        log_std = jnp.clip(log_std, LOG_SIG_MIN, LOG_SIG_MAX)
        return mean, log_std


class Critic(nn.Module):
    """Twin Q networks evaluated in one pass.

    `layer_norm=True` inserts LayerNorm before each hidden ReLU — the
    standard plasticity/stability fix for high update-to-data ratios
    (the reference's K=1-per-single-env-step regime maps to large K
    here; docs/update_schedule.md finding 3 motivates it)."""

    hidden: int = 256
    layer_norm: bool = False

    @nn.compact
    def __call__(self, obs: jnp.ndarray, act: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = jnp.concatenate([obs, act], axis=-1)
        # auto-named Dense_0..Dense_5 — keeps the default param tree (and
        # round-2 checkpoints) unchanged; LN layers are additive names.
        ln = (lambda h, i: nn.LayerNorm(name=f"LN_{i}")(h)) \
            if self.layer_norm else (lambda h, i: h)
        q1 = nn.relu(ln(nn.Dense(self.hidden)(x), 0))
        q1 = nn.relu(ln(nn.Dense(self.hidden)(q1), 1))
        q1 = nn.Dense(1)(q1)
        q2 = nn.relu(ln(nn.Dense(self.hidden)(x), 2))
        q2 = nn.relu(ln(nn.Dense(self.hidden)(q2), 3))
        q2 = nn.Dense(1)(q2)
        return q1, q2


class GRUActor(nn.Module):
    """Recurrent actor for sensor_mode RNN='GRU' (EnvWrapper.py:216-217):
    consumes a (T, obs) history stack, encodes with a GRU, then the same
    mean/log-std heads.

    When `seq_len`/`frame_dim` are set, a flat (..., T·D) stacked obs (the
    ObsHistoryWrapper 'stack' layout that the replay buffer stores) is
    reshaped to the (..., T, D) sequence first — so the GRU policy slots
    into the standard SAC machinery with no buffer changes."""

    action_dim: int
    hidden: int = 256
    seq_len: int = 0
    frame_dim: int = 0

    @nn.compact
    def __call__(self, obs_seq: jnp.ndarray):
        if self.seq_len and obs_seq.shape[-1] == self.seq_len * self.frame_dim:
            obs_seq = obs_seq.reshape(
                obs_seq.shape[:-1] + (self.seq_len, self.frame_dim))
        # obs_seq (..., T, obs_dim)
        gru = nn.GRUCell(features=self.hidden)
        carry = jnp.zeros(obs_seq[..., 0, :].shape[:-1] + (self.hidden,),
                          obs_seq.dtype)
        x = carry
        for t in range(obs_seq.shape[-2]):
            carry, x = gru(carry, obs_seq[..., t, :])
        x = nn.relu(nn.Dense(self.hidden)(x))
        mean = nn.Dense(self.action_dim)(x)
        log_std = jnp.clip(nn.Dense(self.action_dim)(x),
                           LOG_SIG_MIN, LOG_SIG_MAX)
        return mean, log_std
