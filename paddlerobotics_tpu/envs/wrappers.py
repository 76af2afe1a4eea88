"""Batched env wrappers: temporal observation history (stack / GRU).

Rebuild of the reference ObservationWrapper (deployment/envs/
EnvWrapper.py:195-241; SENSOR_MODE['RNN'] = {time_steps, time_interval,
mode ∈ {None, stack, GRU}} at train.py:273-277): keeps a rolling history
of base observations and emits either a flat stack (obs_dim ×
(time_steps+1)) or a (time_steps+1, obs_dim) sequence for the GRU actor.

Functional, batch-first, works with `BatchedQuadrupedEnv`.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class ObsHistoryState(NamedTuple):
    env_state: object
    history: jnp.ndarray    # (B, time_steps*interval, obs_dim)


class ObsHistoryWrapper:
    def __init__(self, env, time_steps: int = 5, time_interval: int = 1,
                 mode: str = "stack"):
        assert mode in ("stack", "GRU")
        self.env = env
        self.time_steps = time_steps
        self.time_interval = time_interval
        self.mode = mode

    @property
    def obs_dim(self):
        base = self.env.obs_dim
        if self.mode == "stack":
            return base * (self.time_steps + 1)
        return base

    # passthroughs so the wrapper is a drop-in env for the trainers
    @property
    def action_dim(self):
        return self.env.action_dim

    @property
    def act_bound(self):
        return self.env.act_bound

    @property
    def act_offset(self):
        return self.env.act_offset

    @property
    def cfg(self):
        return self.env.cfg

    def default_etg(self):
        return self.env.default_etg()

    def _assemble(self, history, obs):
        """history (B,L,obs), obs (B,obs) → stacked/sequence output
        (EnvWrapper.py:209-219: samples every `time_interval` slots plus
        the current obs)."""
        idx = jnp.arange(self.time_steps) * self.time_interval
        past = history[:, idx, :]                      # (B,T,obs)
        seq = jnp.concatenate([past, obs[:, None, :]], axis=1)
        if self.mode == "stack":
            return seq.reshape(seq.shape[0], -1)
        return seq

    def reset(self, rng, etg_w=None, etg_b=None, **kw
              ) -> Tuple[ObsHistoryState, jnp.ndarray]:
        env_state, obs = self.env.reset(rng, etg_w=etg_w, etg_b=etg_b, **kw)
        B = obs.shape[0]
        L = self.time_steps * self.time_interval
        history = jnp.zeros((B, L, obs.shape[-1]))
        history = history.at[:, -1, :].set(obs)
        return ObsHistoryState(env_state, history), \
            self._assemble(history, obs)

    def step(self, state: ObsHistoryState, action, donef=False,
             autoreset: bool = True):
        env_state, obs, rew, done, info = self.env.step(
            state.env_state, action, donef, autoreset=autoreset)
        history = jnp.concatenate(
            [state.history[:, 1:, :], obs[:, None, :]], axis=1)
        # reset history rows on episode boundary
        history = jnp.where(done[:, None, None],
                            jnp.zeros_like(history).at[:, -1, :].set(obs),
                            history)
        out = self._assemble(history, obs)
        return ObsHistoryState(env_state, history), out, rew, done, info
