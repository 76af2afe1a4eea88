"""ES-only ETG pretraining (rebuild of ETGRL/pretrain.py).

The reference optimizes the 12 ETG control-point offsets with SimpleGA
on zero-policy rollouts (pretrain.py:220-277), one serial 400-step
episode per candidate. Here the whole population rides the env batch:
one `es_eval`-style rollout per generation, policy ≡ 0.

Fitness is the episode reward sum PLUS an explicit per-step alive
bonus (`alive_bonus`, default 1.0). The reference uses the plain sum
(pretrain.py:232-242) and gets away with it because its MonitorEnv
reward is net-positive per step for a nominal gait, so surviving
strictly dominates dying. Our calibrated reward shapes (envs/reward.py)
are net-negative per step for slow open-loop gaits (≈-0.5/step measured
at nominal — scripts_dev/openloop_probe.py), which makes
"fall forward fast, die at step ~7 with a few positive progress steps"
the global optimum of the plain sum: ES reliably converges on
falling gaits at any population size. The alive bonus restores the
survival-dominance property the reference's landscape has naturally;
among surviving candidates it is a constant offset and leaves the
ranking (faster walking = higher fitness) unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from paddlerobotics_tpu.algos import es as es_mod
from paddlerobotics_tpu.core.config import QuadrupedConfig
from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv
from paddlerobotics_tpu.etg import fit as etg_fit
from paddlerobotics_tpu.train import metrics as metrics_mod


class ETGPretrainer:
    def __init__(self, config: QuadrupedConfig, num_envs: int | None = None,
                 outdir: str = "pretrain_log", alive_bonus: float = 1.0):
        self.cfg = config
        self.alive_bonus = float(alive_bonus)
        self.B = num_envs or max(config.es.popsize * 8, config.es.popsize)
        assert self.B % config.es.popsize == 0
        self.env = BatchedQuadrupedEnv(config, self.B)
        ecfg = config.es
        self.solver = es_mod.SimpleGA(
            ecfg.num_params, sigma_init=max(ecfg.sigma_init, 0.02),
            sigma_decay=ecfg.sigma_decay, sigma_limit=ecfg.sigma_limit,
            popsize=ecfg.popsize, elite_ratio=ecfg.elite_ratio,
            weight_decay=ecfg.weight_decay)
        self._prior = jnp.asarray(etg_fit.prior_points(config.etg))
        self._w0, self._b0 = etg_fit.opt_with_points(config.etg)
        self.logger = metrics_mod.MetricsLogger(outdir, use_tensorboard=False)

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _rollout_population(self, solutions, rng, n_steps: int):
        P = self.cfg.es.popsize
        pts = self._prior[None] + solutions.reshape(P, 6, 2)
        ws, bs = etg_fit.batched_opt_with_points(
            self.cfg.etg, pts, self._w0, self._b0)
        cand = jnp.repeat(jnp.arange(P), self.B // P,
                          total_repeat_length=self.B)
        w_env = jnp.moveaxis(ws[cand], 0, -1)
        b_env = jnp.moveaxis(bs[cand], 0, -1)
        state, obs = self.env.reset(rng, etg_w=w_env, etg_b=b_env)

        def body(c, _):
            state, ret, alive = c
            nstate, _, rew, done, _ = self.env.step(
                state, jnp.zeros((self.B, 12)), autoreset=False)
            ret = ret + (rew + self.alive_bonus) * alive
            alive = alive * (1.0 - done.astype(jnp.float32))
            return (nstate, ret, alive), None

        (state, ret, alive), _ = jax.lax.scan(
            body, (state, jnp.zeros(self.B), jnp.ones(self.B)), None,
            length=n_steps)
        fitness = jax.ops.segment_sum(ret, cand, num_segments=P) / (self.B // P)
        return fitness

    def train(self, generations: int = 100, episode_len: int = 400,
              seed: int = 0):
        rng = jax.random.key(seed)
        state = self.solver.init(jnp.zeros(self.cfg.es.num_params))
        for g in range(generations):
            rng, k_ask, k_roll = jax.random.split(rng, 3)
            sols, state = self.solver.ask(state, k_ask)
            fitness = self._rollout_population(sols, k_roll, episode_len)
            state = self.solver.tell(state, fitness)
            self.logger.add_scalar("ES/episode_reward",
                                   float(jnp.mean(fitness)), g)
            self.logger.add_scalar("ES/episode_maxre",
                                   float(jnp.max(fitness)), g)
        best, best_r, *_ = self.solver.result(state)
        w, b = etg_fit.opt_with_points(
            self.cfg.etg, points=self._prior + best.reshape(6, 2),
            w0=self._w0, b0=self._b0)
        return best, float(best_r), (w, b)
