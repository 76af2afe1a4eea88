"""Behavior-cloning distillation trainer (rebuild of ETGRL/BCtrain.py).

Reference semantics (BCtrain.py):
- The STUDENT rolls the env (`agent.sample(agent_obs)`, BCtrain.py:102-106
  — DAgger-style on-policy collection), storing paired
  (student_obs, expert_obs) transitions; the first WARMUP_STEPS=200
  actions are uniform random (BCtrain.py:34, 102-104).
- Student obs = expert obs without the 3 BaseDisplacement dims
  (cal_agent_obs, BCtrain.py:77-81), optionally noised (obs2noise,
  BCtrain.py:53-58: rpy/drpy/q/q̇ slices) during BOTH collection and eval.
- Every TRAIN_PER_STEPS=1024 collected steps: TRAIN_PER_TIME=10 epochs
  of BClearn over the buffer at BATCH_SIZE=1024 (BCtrain.py:38-40,
  123-137).
- Headline metric: per-eval-episode ratio of student/expert
  deterministic reward ("ref_ratio", BCtrain.py:183-186).

Here collection is a batched rollout (B envs advance together; the
per-1024-sample distill phase becomes a jitted scan of BC.learn), and a
final full-buffer distillation pass reproduces the reference's
grow-with-the-buffer epoch sweeps in one compiled program.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from paddlerobotics_tpu.algos import replay
from paddlerobotics_tpu.algos.bc import BC, BCState
from paddlerobotics_tpu.algos.sac import SAC, SACState
from paddlerobotics_tpu.core.config import QuadrupedConfig
from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv
from paddlerobotics_tpu.train import metrics as metrics_mod

# obs2noise (BCtrain.py:53-58) in the TRUNCATED (obs[3:]) layout, with
# the reference's raw-σ/normalizer folded into normalized-obs units:
# rpy[4:7] 6e-2/0.1, drpy[7:10] 1e-1/0.5, q[10:22] 1e-2/0.1, q̇[22:34] 0.5.
_NOISE_SLICES = ((4, 7, 0.6), (7, 10, 0.2), (10, 22, 0.1), (22, 34, 0.5))


def student_view(obs: jnp.ndarray, noise_rng=None) -> jnp.ndarray:
    """cal_agent_obs (BCtrain.py:77-81): drop BaseDisplacement, noise."""
    s = obs[..., 3:]
    if noise_rng is not None:
        for i, (lo, hi, sigma) in enumerate(_NOISE_SLICES):
            k = jax.random.fold_in(noise_rng, i)
            s = s.at[..., lo:hi].add(
                sigma * jax.random.normal(k, s[..., lo:hi].shape))
    return s


class BCTrainer:
    def __init__(self, config: QuadrupedConfig, expert: SAC,
                 expert_state: SACState,
                 etg_w: Optional[jnp.ndarray] = None,
                 etg_b: Optional[jnp.ndarray] = None,
                 num_envs: int = 256, outdir: str = "bc_log",
                 sensor_noise: bool = False):
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
        self.act_offset = jnp.asarray(self.env.act_offset)
        # expert's trained gait: (3,H)/(3,) → batch-minor (3,H,B)/(3,B)
        if etg_w is not None:
            self._etg_w = jnp.broadcast_to(
                jnp.asarray(etg_w)[..., None],
                (*jnp.asarray(etg_w).shape, self.B))
            self._etg_b = jnp.broadcast_to(
                jnp.asarray(etg_b)[..., None], (3, self.B))
        else:
            self._etg_w = self._etg_b = None

    def _reset(self, rng):
        return self.env.reset(rng, etg_w=self._etg_w, etg_b=self._etg_b)

    def _maybe_noise_key(self, rng):
        return rng if self.sensor_noise else None

    @functools.partial(jax.jit, static_argnums=(0, 5, 6))
    def collect(self, bc_state: BCState, env_state, obs, rng,
                n_steps: int, warmup: bool):
        """Roll the STUDENT (BCtrain.py:102-106); returns paired views."""
        def body(c, _):
            state, obs, rng = c
            rng, k_a, k_n = jax.random.split(rng, 3)
            s_obs = student_view(obs, self._maybe_noise_key(k_n))
            if warmup:
                act = jax.random.uniform(
                    k_a, (self.B, 12), minval=-1.0, maxval=1.0)
            else:
                mean, log_std = self.bc.actor.apply(
                    bc_state.actor_params, s_obs)
                act = jnp.tanh(
                    mean + jnp.exp(log_std)
                    * jax.random.normal(k_a, mean.shape))
            nstate, nobs, rew, done, _ = self.env.step(
                state, act * self.act_bound + self.act_offset)
            return (nstate, nobs, rng), (s_obs, obs)

        (env_state, obs, rng), (s_obs, e_obs) = jax.lax.scan(
            body, (env_state, obs, rng), None, length=n_steps)
        return env_state, obs, rng, (s_obs.reshape(-1, self.student_obs_dim),
                                     e_obs.reshape(-1, self.env.obs_dim))

    @functools.partial(jax.jit, static_argnums=(0, 4, 5))
    def distill(self, bc_state: BCState, buf, rng, n_updates: int,
                batch_size: int = 1024):
        """n_updates × BClearn at the reference BATCH_SIZE (BCtrain.py:40)."""
        def body(c, _):
            bc_state, rng = c
            rng, k_b, k_u = jax.random.split(rng, 3)
            batch = replay.bc_sample(buf, k_b, batch_size)
            bc_state, losses = self.bc.learn(
                bc_state, batch, self.expert, self.expert_state, k_u)
            return (bc_state, rng), losses

        (bc_state, rng), losses = jax.lax.scan(body, (bc_state, rng), None,
                                               length=n_updates)
        return bc_state, jax.tree.map(jnp.mean, losses)

    @functools.partial(jax.jit, static_argnums=(0, 2, 3))
    def evaluate(self, params, who: str, n_steps: int = 600, rng=None):
        """Deterministic eval (run_evaluate_episodes, BCtrain.py:148-176):
        who='student' predicts on the (optionally noised) truncated view,
        who='expert' on the full obs. Fixed seed; no autoreset."""
        rng = jax.random.key(0) if rng is None else rng
        state, obs = self._reset(rng)

        def body(c, t):
            state, obs, ret, alive, steps, velx, succ = c
            if who == "student":
                k_n = self._maybe_noise_key(
                    jax.random.fold_in(jax.random.key(17), t))
                action = self.bc.predict(params, student_view(obs, k_n))
            else:
                action = self.expert.predict(params, obs)
            nstate, nobs, rew, done, info = self.env.step(
                state, action * self.act_bound + self.act_offset,
                autoreset=False)
            ret = ret + rew * alive
            steps = steps + alive
            velx = velx + jnp.mean(info["velx"] * alive)
            succ = succ + jnp.mean(info["success"] * alive)
            alive = alive * (1.0 - done.astype(jnp.float32))
            return (nstate, nobs, ret, alive, steps, velx, succ), None

        init = (state, obs, jnp.zeros(self.B), jnp.ones(self.B),
                jnp.zeros(self.B), jnp.zeros(()), jnp.zeros(()))
        (state, obs, ret, alive, steps, velx, succ), _ = jax.lax.scan(
            body, init, jnp.arange(n_steps))
        mean_steps = jnp.maximum(jnp.mean(steps), 1.0)
        return (jnp.mean(ret), jnp.mean(steps),
                velx / mean_steps, succ / mean_steps)

    def train(self, total_steps: int = 200_000, distill_epochs: int = 10,
              final_epochs: int = 10, seed: int = 0,
              eval_every: int = 50_000) -> Tuple[BCState, dict]:
        """Collect/distill on the reference cadence: per 1024 new samples,
        `distill_epochs` epochs over the newest window (BCtrain.py:129-137
        sweeps the whole buffer; the full-buffer sweeps are consolidated
        into `final_epochs` passes at the end in one compiled scan)."""
        rng = jax.random.key(seed)
        rng, k_env, k_bc = jax.random.split(rng, 3)
        env_state, obs = jax.jit(self._reset)(k_env)
        bc_state = self.bc.init(k_bc)
        cap = max(total_steps, 1024)
        buf = replay.bc_create(cap, self.student_obs_dim, self.env.obs_dim)
        # chunk ≈ TRAIN_PER_STEPS samples per phase (BCtrain.py:38)
        chunk = max(1024 // self.B, 1)
        steps, warmed = 0, False
        losses = {"actor_loss": jnp.nan, "critic_loss": jnp.nan}
        next_eval = eval_every
        while steps < total_steps:
            env_state, obs, rng, (s_obs, e_obs) = self.collect(
                bc_state, env_state, obs, rng, chunk, not warmed)
            warmed = True
            buf = replay.bc_add_batch(buf, s_obs, e_obs)
            steps += chunk * self.B
            rng, k = jax.random.split(rng)
            # The reference sweeps the WHOLE buffer 10× per phase
            # (BCtrain.py:129-131), so its update count grows with the
            # buffer. Mirror that with the batch count bucketed to
            # powers of two (bounded recompiles of the distill scan).
            n_batches = max(min(steps, cap) // 1024, 1)
            bucket = 1 << max(n_batches - 1, 0).bit_length()
            phase_updates = distill_epochs * min(bucket, 64)
            bc_state, losses = self.distill(bc_state, buf, k, phase_updates)
            if steps >= next_eval:
                next_eval += eval_every
                ret, es, velx, succ = self.evaluate(
                    bc_state.actor_params, "student")
                self.logger.add_scalar("bc/eval_return", float(ret), steps)
                self.logger.add_scalar("bc/eval_steps", float(es), steps)
            self.logger.add_scalar("bc/actor_loss",
                                   float(losses["actor_loss"]), steps)
            self.logger.add_scalar("bc/critic_loss",
                                   float(losses["critic_loss"]), steps)
        # consolidated full-buffer sweeps (BCtrain.py:129-131)
        n_final = final_epochs * max(min(steps, cap) // 1024, 1)
        rng, k = jax.random.split(rng)
        bc_state, losses = self.distill(bc_state, buf, k, n_final)
        return bc_state, losses

    def ratio_report(self, bc_state: BCState, n_steps: int = 600) -> dict:
        """The reference headline: student/expert deterministic reward
        ratio (ref_ratio, BCtrain.py:183-186), same env batch."""
        s_ret, s_steps, s_velx, s_succ = self.evaluate(
            bc_state.actor_params, "student", n_steps)
        e_ret, e_steps, e_velx, e_succ = self.evaluate(
            self.expert_state.actor_params, "expert", n_steps)
        return {
            "student_return": round(float(s_ret), 2),
            "student_steps": round(float(s_steps), 1),
            "student_velx": round(float(s_velx), 3),
            "student_success": round(float(s_succ), 3),
            "expert_return": round(float(e_ret), 2),
            "expert_steps": round(float(e_steps), 1),
            "expert_velx": round(float(e_velx), 3),
            "expert_success": round(float(e_succ), 3),
            "ref_ratio": round(float(s_ret) / max(float(e_ret), 1e-9), 4),
        }
