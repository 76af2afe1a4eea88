"""Sim-to-real dynamics identification (rebuild of ETGRL/Dynamic_train.py
+ model/Dynamic_parallel_model.py).

The reference fans an ES population of 48 normalized dynamics parameters
across xparl RPC workers, each replaying a fixed gait in its own PyBullet
and scoring the std-normalized mismatch of joint-angle + gyro traces
against real-robot logs (loss_func, Dynamic_parallel_model.py:29-41).
Here the population IS the env batch: every candidate's physics params
are a slice of the batched `BDynParams`, so one jitted rollout evaluates
the whole population — no RPC, no futures.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from paddlerobotics_tpu.algos import es as es_mod
from paddlerobotics_tpu.core.config import QuadrupedConfig
from paddlerobotics_tpu.envs import randomize
from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv
from paddlerobotics_tpu.sim.sbatch import BDynParams
from paddlerobotics_tpu.train import metrics as metrics_mod


def generate_trace(env: BatchedQuadrupedEnv, gait: jnp.ndarray,
                   dyn: BDynParams, rng: jax.Array,
                   noise_q: float = 0.0, noise_gyro: float = 0.0):
    """Replay `gait` (T,12) open-loop under `dyn` with the env's ETG
    zeroed (the reference replays raw gait positions in an ETG=0 env,
    Dynamic_parallel_model.py:49,61) and record the joint-angle + gyro
    response — the "real robot log" generator for recoverability
    studies, with optional measurement noise.

    Returns (q (T,B,12), gyro (T,B,3))."""
    B = env.B
    H = env.cfg.etg.H
    zw = jnp.zeros((3, H, B))
    zb = jnp.zeros((3, B))
    state, _ = env.reset(rng, etg_w=zw, etg_b=zb, dyn=dyn)

    def body(state, t):
        action = jnp.broadcast_to(gait[t][None, :], (B, 12))
        nstate, _, _, _, _ = env.step(state, action, autoreset=False)
        s = nstate.robot.s
        return nstate, (s.q.T, s.w.T)

    _, (q, gyro) = jax.lax.scan(body, state, jnp.arange(gait.shape[0]))
    if noise_q > 0.0 or noise_gyro > 0.0:
        kq, kg = jax.random.split(jax.random.fold_in(rng, 91))
        q = q + noise_q * jax.random.normal(kq, q.shape)
        gyro = gyro + noise_gyro * jax.random.normal(kg, gyro.shape)
    return q, gyro


def trace_loss(sim_q, sim_gyro, real_q, real_gyro):
    """Std-normalized max-of-mean-squared-diff loss
    (loss_func, Dynamic_parallel_model.py:29-41). Lower is better;
    fitness = −loss."""
    q_std = jnp.std(real_q, axis=0) + 1e-6          # (12,)
    g_std = jnp.std(real_gyro, axis=0) + 1e-6       # (3,)
    q_err = jnp.mean(((sim_q - real_q) / q_std) ** 2, axis=0)   # (12,)
    g_err = jnp.mean(((sim_gyro - real_gyro) / g_std) ** 2, axis=0)
    return jnp.maximum(jnp.mean(q_err), jnp.mean(g_err))


class DynamicsIdentifier:
    def __init__(self, config: QuadrupedConfig,
                 gait_actions: jnp.ndarray,
                 real_q: jnp.ndarray, real_gyro: jnp.ndarray,
                 popsize: int = 40, sigma: float = 0.5,
                 outdir: str = "dyn_id_log"):
        """gait_actions (T,12) or (G,T,12): recorded joint-space commands
        (deltas from default pose, like gait_action_list npys); real_q
        (…,T,12) / real_gyro (…,T,3): recorded robot responses. Multiple
        gaits are fitted jointly with the loss averaged across them —
        the reference replays TWO gaits ('exp'/'ori') per candidate and
        averages (batch_sample_episodes,
        Dynamic_parallel_model.py:70-77), which is what makes several
        of the 48 params identifiable at all."""
        self.cfg = config
        self.P = popsize
        self.B = popsize
        # candidate dynamics (injected via reset(dyn=...)) carry the full
        # 0-80 ms latency range regardless of cfg.random — keep the
        # policy-obs blend able to reach the whole ring
        config = dataclasses.replace(config, sim=dataclasses.replace(
            config.sim, obs_latency_taps=config.sim.latency_buffer_len))
        self.env = BatchedQuadrupedEnv(config, self.B)
        gait = jnp.asarray(gait_actions)
        if gait.ndim == 2:
            gait = gait[None]
        self.gait = gait                              # (G,T,12)
        self.real_q = jnp.asarray(real_q).reshape(gait.shape[0], -1, 12)
        self.real_gyro = jnp.asarray(real_gyro).reshape(
            gait.shape[0], -1, 3)
        self.G = gait.shape[0]
        self.T = gait.shape[1]
        self.solver = es_mod.SimpleGA(
            randomize.NUM_DYNAMIC_PARAMS, sigma_init=sigma,
            sigma_decay=0.99, sigma_limit=0.01, popsize=popsize,
            elite_ratio=0.1, weight_decay=0.0)
        self.logger = metrics_mod.MetricsLogger(outdir, use_tensorboard=False)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _fitness(self, solutions, rng):
        """(P,48) candidates → (P,) fitness, one batched replay rollout."""
        dyn_leading = jax.vmap(randomize.param2dynamic)(solutions)
        dyn = BDynParams.from_leading(dyn_leading)
        # ETG zeroed: the reference replays the recorded gait as raw
        # position commands in an ETG=0 env (Dynamic_parallel_model.py:49)
        zw = jnp.zeros((3, self.cfg.etg.H, self.B))
        zb = jnp.zeros((3, self.B))

        def one_gait(g):
            state, _ = self.env.reset(rng, etg_w=zw, etg_b=zb, dyn=dyn)

            def body(c, t):
                state, q_err, g_err = c
                action = jnp.broadcast_to(self.gait[g, t][None, :],
                                          (self.B, 12))
                nstate, _, _, _, _ = self.env.step(state, action,
                                                   autoreset=False)
                s = nstate.robot.s
                dq = (s.q.T - self.real_q[g, t][None, :])     # (B,12)
                dg = (s.w.T - self.real_gyro[g, t][None, :])  # (B,3)
                return (nstate, q_err + dq * dq, g_err + dg * dg), None

            init = (state, jnp.zeros((self.B, 12)),
                    jnp.zeros((self.B, 3)))
            (state, q_err, g_err), _ = jax.lax.scan(
                body, init, jnp.arange(self.T))
            q_std = jnp.std(self.real_q[g], axis=0) + 1e-6
            g_std = jnp.std(self.real_gyro[g], axis=0) + 1e-6
            q_loss = jnp.mean(q_err / self.T / q_std[None, :] ** 2,
                              axis=1)
            g_loss = jnp.mean(g_err / self.T / g_std[None, :] ** 2,
                              axis=1)
            return jnp.maximum(q_loss, g_loss)

        # mean over gaits (reference averages exp/ori rewards,
        # Dynamic_parallel_model.py:75)
        losses = jnp.stack([one_gait(g) for g in range(self.G)])
        return -jnp.mean(losses, axis=0)

    def score(self, solutions: jnp.ndarray, rng=None) -> jnp.ndarray:
        """Trace loss per candidate (N,48) against THIS identifier's
        recorded traces — held-out scoring for recoverability studies.
        Tiles the candidates up to the population/env batch size."""
        solutions = jnp.atleast_2d(solutions)
        n = solutions.shape[0]
        reps = -(-self.P // n)
        tiled = jnp.tile(solutions, (reps, 1))[:self.P]
        fit = self._fitness(tiled, jax.random.key(0) if rng is None
                            else rng)
        return -fit[:n]

    def identify(self, epochs: int = 50, seed: int = 0):
        rng = jax.random.key(seed)
        state = self.solver.init(jnp.zeros(randomize.NUM_DYNAMIC_PARAMS))
        for e in range(epochs):
            rng, k_ask, k_roll = jax.random.split(rng, 3)
            sols, state = self.solver.ask(state, k_ask)
            fit = self._fitness(sols, k_roll)
            state = self.solver.tell(state, fit)
            self.logger.add_scalar("dyn_id/best_loss",
                                   -float(jnp.max(fit)), e)
        best, best_r, *_ = self.solver.result(state)
        return best, randomize.param2dynamic(best)
