"""Device-resident replay buffers.

Rebuilds parl.utils.ReplayMemory (used at train.py:323-324) and
alg/BCreplay_buffer.py as preallocated device arrays with a functional
add/sample API, so the whole SAC train step (env step → buffer add →
sample → gradient update) fuses into one XLA program — no host traffic.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp


class ReplayBuffer(NamedTuple):
    obs: jnp.ndarray        # (N, obs_dim)
    act: jnp.ndarray        # (N, act_dim)
    rew: jnp.ndarray        # (N, 1)
    next_obs: jnp.ndarray   # (N, obs_dim)
    terminal: jnp.ndarray   # (N, 1)  (1−done convention, train.py:148-149)
    ptr: jnp.ndarray        # () int32 next write slot
    size: jnp.ndarray       # () int32 valid entries


def create(capacity: int, obs_dim: int, act_dim: int) -> ReplayBuffer:
    return ReplayBuffer(
        obs=jnp.zeros((capacity, obs_dim)),
        act=jnp.zeros((capacity, act_dim)),
        rew=jnp.zeros((capacity, 1)),
        next_obs=jnp.zeros((capacity, obs_dim)),
        terminal=jnp.zeros((capacity, 1)),
        ptr=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32))


def add_batch(buf: ReplayBuffer, obs, act, rew, next_obs, terminal
              ) -> ReplayBuffer:
    """Append a batch of B transitions (ring semantics).

    Writes are a contiguous dynamic-update-slice modulo capacity; if the
    batch would wrap past the end, the wrap segment lands at the start.
    """
    N = buf.obs.shape[0]
    B = obs.shape[0]
    # indices to write: (ptr + arange(B)) mod N, realized as scatter
    idx = (buf.ptr + jnp.arange(B)) % N
    new = ReplayBuffer(
        obs=buf.obs.at[idx].set(obs),
        act=buf.act.at[idx].set(act),
        rew=buf.rew.at[idx].set(rew.reshape(B, 1)),
        next_obs=buf.next_obs.at[idx].set(next_obs),
        terminal=buf.terminal.at[idx].set(terminal.reshape(B, 1)),
        ptr=(buf.ptr + B) % N,
        size=jnp.minimum(buf.size + B, N))
    return new


def sample(buf: ReplayBuffer, rng: jax.Array, batch_size: int
           ) -> Dict[str, jnp.ndarray]:
    """Uniform random batch over valid entries."""
    idx = jax.random.randint(rng, (batch_size,), 0,
                             jnp.maximum(buf.size, 1))
    return {
        "obs": buf.obs[idx],
        "act": buf.act[idx],
        "rew": buf.rew[idx],
        "next_obs": buf.next_obs[idx],
        "terminal": buf.terminal[idx],
    }


def sample_many(buf: ReplayBuffer, rng: jax.Array, k: int,
                batch_size: int) -> Dict[str, jnp.ndarray]:
    """K independent uniform batches in ONE gather, leading axis k.

    Distribution-identical to k sequential `sample` calls (indices are
    independent of the learner, and the buffer contents don't change
    between the K updates of a control step), but the random-access HBM
    gather happens once for k·batch_size rows instead of k times —
    feeds the scan-over-updates in train/etg_rl without k round trips
    through the 1M-row buffer.
    """
    idx = jax.random.randint(rng, (k * batch_size,), 0,
                             jnp.maximum(buf.size, 1))
    shp = (k, batch_size)
    return {
        "obs": buf.obs[idx].reshape(shp + buf.obs.shape[1:]),
        "act": buf.act[idx].reshape(shp + buf.act.shape[1:]),
        "rew": buf.rew[idx].reshape(shp + buf.rew.shape[1:]),
        "next_obs": buf.next_obs[idx].reshape(shp + buf.next_obs.shape[1:]),
        "terminal": buf.terminal[idx].reshape(shp + buf.terminal.shape[1:]),
    }


class BCReplayBuffer(NamedTuple):
    """Paired (student_obs, expert_obs) buffer (BCreplay_buffer.py:21-78)."""

    obs: jnp.ndarray        # (N, obs_dim) student
    ref_obs: jnp.ndarray    # (N, ref_obs_dim) expert
    ptr: jnp.ndarray
    size: jnp.ndarray


def bc_create(capacity: int, obs_dim: int, ref_obs_dim: int) -> BCReplayBuffer:
    return BCReplayBuffer(
        obs=jnp.zeros((capacity, obs_dim)),
        ref_obs=jnp.zeros((capacity, ref_obs_dim)),
        ptr=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32))


def bc_add_batch(buf: BCReplayBuffer, obs, ref_obs) -> BCReplayBuffer:
    N = buf.obs.shape[0]
    B = obs.shape[0]
    idx = (buf.ptr + jnp.arange(B)) % N
    return BCReplayBuffer(
        obs=buf.obs.at[idx].set(obs),
        ref_obs=buf.ref_obs.at[idx].set(ref_obs),
        ptr=(buf.ptr + B) % N,
        size=jnp.minimum(buf.size + B, N))


def bc_sample(buf: BCReplayBuffer, rng: jax.Array, batch_size: int):
    idx = jax.random.randint(rng, (batch_size,), 0, jnp.maximum(buf.size, 1))
    return {"obs": buf.obs[idx], "ref_obs": buf.ref_obs[idx]}
