"""Actor/critic networks matching the reference architecture.

Rebuild of model/mujoco_model.py: Actor = 2×256 ReLU MLP with mean and
clamped log-std heads (LOG_SIG_MIN/MAX −20/2, mujoco_model.py:21-22);
Critic = twin Q MLPs on concat(obs, act) (mujoco_model.py:63-89).
Flax linen; bfloat16-friendly widths (256 = 2×128 MXU lanes).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
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


def critic_apply_fused(params, obs: jnp.ndarray, act: jnp.ndarray,
                       layer_norm: bool = False,
                       bf16: bool = False) -> Tuple[jnp.ndarray,
                                                    jnp.ndarray]:
    """Twin-Q forward with the two Q-MLPs fused into stacked matmuls.

    Numerically identical to `Critic.__call__` on the SAME param tree
    (Dense_0..2 = Q1, Dense_3..5 = Q2, optional LN_0..3), but each layer
    is ONE dot_general with a size-2 batch dim instead of two sequential
    256-wide matmuls — on TPU the learner chain is latency-bound on
    small matmuls (docs/perf.md), so halving the op count shortens the
    per-update critical path. `bf16=True` additionally runs the matmuls
    in bfloat16 with fp32 accumulation (MXU-native; params/LN stay
    fp32) — opt-in via SACConfig.bf16_matmul.
    """
    p = params["params"]
    x = jnp.concatenate([obs, act], axis=-1)

    def stacked(names):
        return (jnp.stack([p[n]["kernel"] for n in names]),
                jnp.stack([p[n]["bias"] for n in names]))

    def mm(h, w):
        # h (..., 2, b, i) @ w (2, i, o) with fp32 accumulate
        if bf16:
            h = h.astype(jnp.bfloat16)
            w = w.astype(jnp.bfloat16)
        return jax.lax.dot_general(
            h, w, (((h.ndim - 1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    def ln(h, names):
        scale = jnp.stack([p[n]["scale"] for n in names])[:, None]
        bias = jnp.stack([p[n]["bias"] for n in names])[:, None]
        mu = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
        return (h - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias

    w1, b1 = stacked(("Dense_0", "Dense_3"))
    h = jnp.einsum("bi,kio->kbo", *((x.astype(jnp.bfloat16),
                                     w1.astype(jnp.bfloat16))
                                    if bf16 else (x, w1)),
                   preferred_element_type=jnp.float32) + b1[:, None]
    if layer_norm:
        h = ln(h, ("LN_0", "LN_2"))
    h = nn.relu(h)
    w2, b2 = stacked(("Dense_1", "Dense_4"))
    h = mm(h, w2) + b2[:, None]
    if layer_norm:
        h = ln(h, ("LN_1", "LN_3"))
    h = nn.relu(h)
    w3, b3 = stacked(("Dense_2", "Dense_5"))
    q = mm(h, w3) + b3[:, None]
    return q[0], q[1]


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
