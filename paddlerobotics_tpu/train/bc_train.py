"""Behavior-cloning distillation trainer (rebuild of ETGRL/BCtrain.py).

The reference collects paired (student_obs, expert_obs) transitions by
rolling the expert policy — the expert sees the full obs (incl. base
displacement), the student a truncated/noised view (cal_agent_obs,
BCtrain.py:77-81: student obs = obs[3:]) — and distills every 1024 steps
× 10 epochs (BCtrain.py:87-143). Here collection is a batched rollout
and distillation a jitted scan of BC.learn over buffer samples.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from paddlerobotics_tpu.algos import replay
from paddlerobotics_tpu.algos.bc import BC, BCState
from paddlerobotics_tpu.algos.sac import SAC, SACState
from paddlerobotics_tpu.core.config import QuadrupedConfig
from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv
from paddlerobotics_tpu.train import metrics as metrics_mod


def student_view(obs: jnp.ndarray, noise_rng=None) -> jnp.ndarray:
    """Student obs = expert obs without the 3 BaseDisplacement dims
    (cal_agent_obs, BCtrain.py:77-81), optionally noised
    (obs2noise, BCtrain.py:53-58: noise on contact/imu slices)."""
    s = obs[..., 3:]
    if noise_rng is not None:
        noise = jnp.zeros_like(s)
        # contact[0:4], imu rpy[4:7] drpy[7:10] in the truncated layout
        noise = noise.at[..., 0:4].set(
            0.1 * jax.random.normal(noise_rng, s[..., 0:4].shape))
        noise = noise.at[..., 4:10].set(
            0.05 * jax.random.normal(noise_rng, s[..., 4:10].shape))
        s = s + noise
    return s


class BCTrainer:
    def __init__(self, config: QuadrupedConfig, expert: SAC,
                 expert_state: SACState, num_envs: int = 256,
                 outdir: str = "bc_log", sensor_noise: bool = False):
        self.cfg = config
        self.B = num_envs
        self.env = BatchedQuadrupedEnv(config, self.B)
        self.expert = expert
        self.expert_state = expert_state
        self.student_obs_dim = self.env.obs_dim - 3
        self.bc = BC(self.student_obs_dim, 12)
        self.sensor_noise = sensor_noise
        self.logger = metrics_mod.MetricsLogger(outdir, use_tensorboard=False)
        self.act_bound = jnp.asarray(self.env.act_bound)

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def collect(self, env_state, obs, rng, n_steps: int):
        """Roll the expert; returns stacked (student_obs, expert_obs)."""
        def body(c, _):
            state, obs, rng = c
            rng, k = jax.random.split(rng)
            act = self.expert.predict(self.expert_state.actor_params, obs)
            nstate, nobs, rew, done, _ = self.env.step(
                state, act * self.act_bound)
            ks = k if self.sensor_noise else None
            s_obs = student_view(obs, ks)
            return (nstate, nobs, rng), (s_obs, obs)

        (env_state, obs, rng), (s_obs, e_obs) = jax.lax.scan(
            body, (env_state, obs, rng), None, length=n_steps)
        return env_state, obs, rng, (s_obs.reshape(-1, self.student_obs_dim),
                                     e_obs.reshape(-1, self.env.obs_dim))

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def distill(self, bc_state: BCState, buf, rng, epochs: int):
        def body(c, _):
            bc_state, rng = c
            rng, k_b, k_u = jax.random.split(rng, 3)
            batch = replay.bc_sample(buf, k_b, 256)
            bc_state, losses = self.bc.learn(
                bc_state, batch, self.expert, self.expert_state, k_u)
            return (bc_state, rng), losses

        (bc_state, rng), losses = jax.lax.scan(body, (bc_state, rng), None,
                                               length=epochs)
        return bc_state, jax.tree.map(jnp.mean, losses)

    def train(self, total_steps: int = 50_000, collect_chunk: int = 16,
              distill_epochs: int = 10, seed: int = 0
              ) -> Tuple[BCState, dict]:
        rng = jax.random.key(seed)
        rng, k_env, k_bc = jax.random.split(rng, 3)
        env_state, obs = jax.jit(self.env.reset)(k_env)
        bc_state = self.bc.init(k_bc)
        buf = replay.bc_create(200_000, self.student_obs_dim,
                               self.env.obs_dim)
        steps = 0
        losses = {}
        while steps < total_steps:
            env_state, obs, rng, (s_obs, e_obs) = self.collect(
                env_state, obs, rng, collect_chunk)
            buf = replay.bc_add_batch(buf, s_obs, e_obs)
            steps += collect_chunk * self.B
            rng, k = jax.random.split(rng)
            bc_state, losses = self.distill(bc_state, buf, k, distill_epochs)
            self.logger.add_scalar("bc/actor_loss",
                                   float(losses["actor_loss"]), steps)
            self.logger.add_scalar("bc/critic_loss",
                                   float(losses["critic_loss"]), steps)
        return bc_state, losses
