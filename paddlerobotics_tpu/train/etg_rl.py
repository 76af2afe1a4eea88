"""ETG-RL dual-loop trainer: SAC residual policy + ES-optimized gait.

TPU-native rebuild of the reference's main recipe (ETGRL/train.py:
252-449): the serial per-episode loop becomes batched autoreset rollouts
(`lax.scan` over control steps × B envs in one jitted program), and the
ES phase evaluates the entire population in ONE rollout — each candidate
gait is fitted (batched least squares) and assigned to a slice of envs,
replacing 40 serial 400-step episodes (train.py:404-408) and the xparl
actor fan-out with a single compiled program.

Schedule parity (train.py:34-47, 354-437):
- SAC: batch 256, γ .99, τ .005, α .2, lr 3e-4, warmup 1e4 env steps,
  replay 1e6; episode cap e_step 400 → +50 per eval window → 600.
- ES: every 5e4 env steps, 10 generations of SimpleGA (popsize 40,
  σ 0.02→0.005 ×0.99, elite 10%, weight decay 0.005) over 12 control-
  point offsets; optional replay of ES rollouts into the SAC buffer
  (--es_rpm, train.py:240-241).
- eval every 1e4 env steps (600-step deterministic episodes), checkpoint
  via Orbax (params + ES state + ETG (w,b) + RNG), mirroring the .pt +
  .npz pairs of train.py:386-390.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from paddlerobotics_tpu.algos import es as es_mod
from paddlerobotics_tpu.algos import replay
from paddlerobotics_tpu.algos.sac import SAC, SACState
from paddlerobotics_tpu.core.config import QuadrupedConfig
from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv, BEnvState
from paddlerobotics_tpu.etg import fit as etg_fit
from paddlerobotics_tpu.train import checkpoints, metrics as metrics_mod

INFO_CHANNELS = ("torso", "up", "feet", "tau", "stand", "badfoot",
                 "footcontact", "velx", "success")


class AdaptiveDRController:
    """Success-gated DR-scale schedule (ADR-style alternative to the
    linear anneal): widen the randomization scale while the EMA success
    rate clears `hi`, back off below `lo`. Motivated by docs/dr_study.md
    — the linear schedule keeps pushing scale through a struggling
    policy, which (without dynamic_vec) ends in critic collapse; gating
    on success holds the frontier at the edge of competence instead.
    Pure host-side logic on the traced BEnvState.dr_scale — never
    recompiles."""

    def __init__(self, rcfg, ema_decay: float = 0.9):
        self.scale = rcfg.dr_scale_start
        self.lo = rcfg.dr_success_lo
        self.hi = rcfg.dr_success_hi
        self.step_up = rcfg.dr_step_up
        self.step_down = rcfg.dr_step_down
        self.min_scale = rcfg.dr_scale_start
        self.max_scale = rcfg.dynamics_scale
        self.ema_decay = ema_decay
        self.ema = None

    def update(self, success: float) -> float:
        """Feed one rollout chunk's mean success; returns the new scale."""
        self.ema = (success if self.ema is None else
                    self.ema_decay * self.ema +
                    (1.0 - self.ema_decay) * success)
        if self.ema >= self.hi:
            self.scale += self.step_up
        elif self.ema < self.lo:
            self.scale -= self.step_down
        self.scale = min(max(self.scale, self.min_scale), self.max_scale)
        return self.scale


def _build_solver(ecfg):
    """Instantiate the configured ES solver (train.py uses SimpleGA;
    alg/es.py ships five — all selectable via ESConfig.solver)."""
    name = ecfg.solver
    if name == "simple_ga":
        return es_mod.SimpleGA(
            ecfg.num_params, sigma_init=ecfg.sigma_init,
            sigma_decay=ecfg.sigma_decay, sigma_limit=ecfg.sigma_limit,
            popsize=ecfg.popsize, elite_ratio=ecfg.elite_ratio,
            weight_decay=ecfg.weight_decay)
    if name == "simple_es":
        return es_mod.SimpleES(
            ecfg.num_params, popsize=ecfg.popsize,
            sigma_init=ecfg.sigma_init, sigma_decay=ecfg.sigma_decay,
            sigma_limit=ecfg.sigma_limit, weight_decay=ecfg.weight_decay)
    if name == "open_es":
        return es_mod.OpenES(
            ecfg.num_params, sigma_init=ecfg.sigma_init,
            sigma_decay=ecfg.sigma_decay, sigma_limit=ecfg.sigma_limit,
            popsize=ecfg.popsize, weight_decay=ecfg.weight_decay)
    if name == "pepg":
        return es_mod.PEPG(
            ecfg.num_params, sigma_init=ecfg.sigma_init,
            sigma_decay=ecfg.sigma_decay, sigma_limit=ecfg.sigma_limit,
            popsize=ecfg.popsize, weight_decay=ecfg.weight_decay)
    if name == "cma_es":
        return es_mod.CMAES(ecfg.num_params, sigma_init=ecfg.sigma_init,
                            popsize=ecfg.popsize,
                            weight_decay=ecfg.weight_decay)
    raise ValueError(f"unknown ES solver {name!r}")


class TrainCarry(NamedTuple):
    env_state: BEnvState
    obs: jnp.ndarray
    sac_state: SACState
    buffer: replay.ReplayBuffer
    rng: jax.Array


class ETGRLTrainer:
    def __init__(self, config: QuadrupedConfig, num_envs: int | None = None,
                 outdir: str = "train_log", updates_per_step: int = 1,
                 use_tensorboard: bool = False, mesh=None):
        """mesh: optional jax.sharding.Mesh with ('env','model') axes —
        envs shard batch-minor over 'env' (stepping needs no
        communication), params are tensor-parallel over 'model'/
        replicated, replay rows are env-sharded so gradient psum is the
        compiled Fleet-allreduce equivalent (parallel/sharding.py)."""
        self.cfg = config
        self.B = num_envs or config.train.num_envs
        self.mesh = mesh
        self.env = BatchedQuadrupedEnv(config, self.B)
        # Temporal observation modes (SENSOR_MODE['RNN'], train.py:273-277):
        # 'stack' flattens a (T+1)-frame history for the MLP policy;
        # 'GRU' keeps the same stacked storage but encodes it with a
        # recurrent actor. Anything else than None must not be ignored.
        actor = None
        rnn_mode = config.sensors.rnn_mode
        if rnn_mode not in ("None", "none", "", None):
            if rnn_mode not in ("stack", "GRU"):
                raise ValueError(f"unknown RNN_mode {rnn_mode!r} "
                                 "(expected None|stack|GRU)")
            from paddlerobotics_tpu.envs.wrappers import ObsHistoryWrapper

            base_dim = self.env.obs_dim
            self.env = ObsHistoryWrapper(
                self.env, time_steps=config.sensors.rnn_time_steps,
                time_interval=config.sensors.rnn_time_interval,
                mode="stack")
            if rnn_mode == "GRU":
                from paddlerobotics_tpu.algos.networks import GRUActor

                actor = GRUActor(
                    self.env.action_dim, hidden=config.sac.hidden_dim,
                    seq_len=config.sensors.rnn_time_steps + 1,
                    frame_dim=base_dim)
        self.sac = SAC(self.env.obs_dim, self.env.action_dim, config.sac,
                       actor=actor)
        ecfg = config.es
        # Dedicated (smaller) env batch for ES population rollouts —
        # see ESConfig.es_num_envs. Must mirror the training env's
        # wrapper stack so obs dims match the frozen policy.
        if ecfg.es_num_envs and 0 < ecfg.es_num_envs < self.B \
                and ecfg.popsize > 0:
            B_es = max(ecfg.popsize,
                       (ecfg.es_num_envs // ecfg.popsize) * ecfg.popsize)
            es_env = BatchedQuadrupedEnv(config, B_es)
            if rnn_mode not in ("None", "none", "", None):
                from paddlerobotics_tpu.envs.wrappers import \
                    ObsHistoryWrapper

                es_env = ObsHistoryWrapper(
                    es_env, time_steps=config.sensors.rnn_time_steps,
                    time_interval=config.sensors.rnn_time_interval,
                    mode="stack")
            self.es_env, self.es_B = es_env, B_es
        else:
            self.es_env, self.es_B = self.env, self.B
        self.solver = _build_solver(ecfg)
        self.updates_per_step = updates_per_step
        self.outdir = outdir
        self._restore_from = None
        self.logger = metrics_mod.MetricsLogger(outdir, use_tensorboard)
        self.act_bound = jnp.asarray(self.env.act_bound)
        self.act_offset = jnp.asarray(self.env.act_offset)

        self._prior_points = jnp.asarray(etg_fit.prior_points(config.etg))
        w0, b0 = etg_fit.opt_with_points(config.etg)
        self._w0, self._b0 = w0, b0

        # jitted phase programs (built lazily per chunk length)
        self._rollout_cache = {}


    def restore(self, target: str):
        """Arm a checkpoint restore for the next train() call
        (the reference's --load, train.py:333-334)."""
        self._restore_from = target
        return self

    # -- ETG fitting ---------------------------------------------------------

    def fit_etg(self, param12: jnp.ndarray):
        """12 ES params → proximally-refit (w, b) (train.py:350-352)."""
        pts = self._prior_points + param12.reshape(6, 2)
        return etg_fit.opt_with_points(self.cfg.etg, points=pts,
                                       w0=self._w0, b0=self._b0)

    def fit_etg_population(self, params: jnp.ndarray):
        """(P,12) → (P,3,H), (P,3)."""
        pts = self._prior_points[None] + params.reshape(-1, 6, 2)
        return etg_fit.batched_opt_with_points(
            self.cfg.etg, pts, self._w0, self._b0)

    def _set_etg(self, env_state, w_env, b_env):
        """Swap the carried ETG readout, looking through the (optional)
        observation-history wrapper state."""
        if hasattr(env_state, "env_state"):      # ObsHistoryState
            inner = env_state.env_state.replace(etg_w=w_env, etg_b=b_env)
            return env_state._replace(env_state=inner)
        return env_state.replace(etg_w=w_env, etg_b=b_env)

    def _set_dr_scale(self, env_state, scale: float):
        """Anneal the DR curriculum scale (traced BEnvState field)."""
        inner = getattr(env_state, "env_state", env_state)
        inner = inner.replace(dr_scale=jnp.asarray(scale, jnp.float32))
        if hasattr(env_state, "env_state"):
            return env_state._replace(env_state=inner)
        return inner

    def _broadcast_etg(self, w, b):
        """(3,H)/(3,) → batch-minor (3,H,B)/(3,B)."""
        B = self.B
        return (jnp.broadcast_to(w[..., None], w.shape + (B,)),
                jnp.broadcast_to(b[..., None], b.shape + (B,)))

    # -- SAC rollout+learn chunk ---------------------------------------------

    def _make_rollout(self, n_steps: int, warm: bool):
        env, sac, cfg = self.env, self.sac, self.cfg

        def chunk(carry: TrainCarry, e_step: jnp.ndarray):
            def body(c: TrainCarry, _):
                rng, k_act, k_learn = jax.random.split(c.rng, 3)
                if warm:
                    action, _ = sac.sample(c.sac_state.actor_params, c.obs,
                                           k_act)
                    n_det = int(cfg.sac.det_rollout_frac * self.B)
                    if n_det > 0:
                        # first n_det envs roll the mean action so replay
                        # covers the eval-time (deterministic) state
                        # distribution — see SACConfig.det_rollout_frac
                        det = sac.predict(c.sac_state.actor_params, c.obs)
                        mask = (jnp.arange(self.B) < n_det)[:, None]
                        action = jnp.where(mask, det, action)
                else:
                    k_act, k_gait = jax.random.split(k_act)
                    action = jax.random.uniform(
                        k_act, (self.B, self.env.action_dim), minval=-1.0,
                        maxval=1.0)
                    n_gait = int(cfg.sac.warmup_gait_frac * self.B)
                    if n_gait > 0:
                        # first n_gait envs roll the open-loop gait
                        # (near-zero residual) so replay sees walking
                        # transitions from step one — see SACConfig
                        on_gait = jnp.clip(
                            cfg.sac.warmup_gait_sigma * jax.random.normal(
                                k_gait, (self.B, self.env.action_dim)),
                            -1.0, 1.0)
                        mask = (jnp.arange(self.B) < n_gait)[:, None]
                        action = jnp.where(mask, on_gait, action)
                es_ = getattr(c.env_state, "env_state", c.env_state)
                donef = (es_.step_idx + 1) > e_step
                nstate, nobs, rew, done, info = env.step(
                    c.env_state, action * self.act_bound + self.act_offset, donef)
                terminal = 1.0 - done.astype(jnp.float32)  # train.py:148-149
                buf = replay.add_batch(c.buffer, c.obs, action, rew, nobs,
                                       terminal)
                sac_state = c.sac_state
                losses = {"critic_loss": jnp.zeros(()),
                          "actor_loss": jnp.zeros(())}
                if warm and self.updates_per_step > 0:
                    # K gradient updates per batched env step as a scan —
                    # compile time stays flat in K, so high update:data
                    # ratios (the reference does 1 update per SINGLE-env
                    # step, train.py:163-167) are reachable. See
                    # docs/update_schedule.md for the sweep. All K
                    # batches are gathered from replay in ONE fused
                    # random-access pass (replay.sample_many) — buffer
                    # contents don't change between the K updates, so
                    # this is distribution-identical to per-update
                    # sampling.
                    k_b, k_learn = jax.random.split(k_learn)
                    batches = replay.sample_many(
                        buf, k_b, self.updates_per_step,
                        cfg.sac.batch_size)

                    def upd(st, xs):
                        batch, k_u = xs
                        return sac.learn(st, batch, k_u)

                    sac_state, losses_seq = jax.lax.scan(
                        upd, sac_state,
                        (batches,
                         jax.random.split(k_learn, self.updates_per_step)))
                    losses = jax.tree.map(jnp.mean, losses_seq)
                out = {"reward": jnp.mean(rew),
                       "done_frac": jnp.mean(done.astype(jnp.float32)),
                       **{k: jnp.mean(info[k]) for k in INFO_CHANNELS},
                       **losses}
                return TrainCarry(nstate, nobs, sac_state, buf, rng), out

            carry, outs = jax.lax.scan(body, carry, None, length=n_steps)
            return carry, jax.tree.map(jnp.mean, outs)

        return jax.jit(chunk)

    def rollout_chunk(self, carry, e_step: int, n_steps: int, warm: bool):
        key = (n_steps, warm)
        if key not in self._rollout_cache:
            self._rollout_cache[key] = self._make_rollout(n_steps, warm)
        return self._rollout_cache[key](carry, jnp.asarray(e_step))

    # -- ES population evaluation --------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 5, 6))
    def es_eval(self, actor_params, etg_w_pop, etg_b_pop, rng,
                n_steps: int, popsize: int, buffer=None):
        """Evaluate a population in one batched rollout.

        etg_w_pop (P,3,H), etg_b_pop (P,3). Each candidate runs on B//P
        envs with the frozen deterministic policy (run_EStrain_episode,
        train.py:213-249). Returns per-candidate mean return and mean
        episode length; when `buffer` is given (--es_rpm,
        train.py:240-241), the first env of each candidate also feeds
        the SAC replay buffer (P transitions/step — the reference's
        serial-episode data rate).
        """
        B, P = self.es_B, popsize
        cand = jnp.repeat(jnp.arange(P), B // P, total_repeat_length=B)
        w_env = jnp.moveaxis(etg_w_pop[cand], 0, -1)   # (3,H,B)
        b_env = jnp.moveaxis(etg_b_pop[cand], 0, -1)   # (3,B)
        # dr_scale=es_dyn_scale (default 0 == exactly nominal dynamics,
        # the round-3 curriculum semantics) — see ESConfig.es_nominal_dyn
        # for why ES fitness must not ride the training draws
        dr0 = (self.cfg.es.es_dyn_scale
               if (self.cfg.es.es_nominal_dyn
                   and self.cfg.random.random_dynamics) else None)
        state, obs = self.es_env.reset(rng, etg_w=w_env, etg_b=b_env,
                                       dr_scale=dr0)
        sub = jnp.arange(P) * (B // P)                 # buffer sub-sample

        def body(c, _):
            state, obs, ret, alive, steps, buf = c
            action = self.sac.predict(actor_params, obs)
            nstate, nobs, rew, done, info = self.es_env.step(
                state, action * self.act_bound + self.act_offset, autoreset=False)
            if buf is not None:
                buf = replay.add_batch(
                    buf, obs[sub], action[sub], rew[sub], nobs[sub],
                    1.0 - done[sub].astype(jnp.float32))
            ret = ret + rew * alive
            steps = steps + alive
            alive = alive * (1.0 - done.astype(jnp.float32))
            return (nstate, nobs, ret, alive, steps, buf), None

        init = (state, obs, jnp.zeros(B), jnp.ones(B), jnp.zeros(B), buffer)
        (state, obs, ret, alive, steps, buffer), _ = jax.lax.scan(
            body, init, None, length=n_steps)
        seg = cand
        fitness = jax.ops.segment_sum(ret, seg, num_segments=P) / (B // P)
        ep_len = jax.ops.segment_sum(steps, seg, num_segments=P) / (B // P)
        return fitness, ep_len, buffer

    # -- evaluation ----------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def evaluate(self, actor_params, etg_w, etg_b, n_steps: int,
                 rng=None, dr_scale=None):
        """Deterministic eval (run_evaluate_episodes, train.py:182-211).

        dr_scale: override the DR draw scale for the eval batch
        (None = the configured scale; 0.0 = nominal dynamics — used by
        the ES baseline when es_nominal_dyn is set)."""
        rng = jax.random.key(0) if rng is None else rng
        w_env, b_env = self._broadcast_etg(etg_w, etg_b)
        state, obs = self.env.reset(rng, etg_w=w_env, etg_b=b_env,
                                    dr_scale=dr_scale)

        def body(c, _):
            state, obs, ret, alive, steps, infos = c
            action = self.sac.predict(actor_params, obs)
            nstate, nobs, rew, done, info = self.env.step(
                state, action * self.act_bound + self.act_offset, autoreset=False)
            ret = ret + rew * alive
            steps = steps + alive
            infos = {k: infos[k] + jnp.mean(info[k] * alive)
                     for k in INFO_CHANNELS}
            alive = alive * (1.0 - done.astype(jnp.float32))
            return (nstate, nobs, ret, alive, steps, infos), None

        infos0 = {k: jnp.zeros(()) for k in INFO_CHANNELS}
        init = (state, obs, jnp.zeros(self.B), jnp.ones(self.B),
                jnp.zeros(self.B), infos0)
        (state, obs, ret, alive, steps, infos), _ = jax.lax.scan(
            body, init, None, length=n_steps)
        return jnp.mean(ret), jnp.mean(steps), infos

    # -- main loop -----------------------------------------------------------

    def train(self, max_steps: int | None = None,
              chunk_steps: int = 50, seed: int = 0,
              checkpoint: bool = True,
              init_etg_param: jnp.ndarray | None = None):
        """init_etg_param: 12 control-point offsets to start the gait
        from (the reference's --ETG_path npz "param",
        train.py:281-295) — e.g. the output of ETGPretrainer."""
        cfg = self.cfg
        tcfg = cfg.train
        max_steps = max_steps or tcfg.max_steps
        rng = jax.random.key(seed)
        rng, k_env, k_sac, k_es = jax.random.split(rng, 4)

        if init_etg_param is None:
            init_etg_param = jnp.zeros(cfg.es.num_params)
        sac_state = self.sac.init(k_sac)
        if getattr(self, "_restore_from", None):
            restored = checkpoints.restore(self._restore_from, {
                "sac": sac_state._asdict(),
                "etg_w": jnp.zeros((3, cfg.etg.H)), "etg_b": jnp.zeros(3),
                "etg_param": jnp.zeros(cfg.es.num_params)})
            sac_state = type(sac_state)(**restored["sac"])
            init_etg_param = jnp.asarray(restored["etg_param"])
        es_state = self.solver.init(jnp.asarray(init_etg_param))
        etg_best_param = jnp.asarray(init_etg_param)
        w, b = self.fit_etg(etg_best_param)

        w_env, b_env = self._broadcast_etg(w, b)
        env_state, obs = jax.jit(self.env.reset)(k_env, w_env, b_env)
        buf = replay.create(cfg.sac.memory_size, self.env.obs_dim,
                            self.env.action_dim)
        carry = TrainCarry(env_state, obs, sac_state, buf, rng)
        if self.mesh is not None:
            carry = self._place_on_mesh(carry)

        total_steps = 0
        e_step = tcfg.e_step
        test_flag = 0
        es_flag = 0
        es_gen = 0
        reset_flag = 0
        # eval-peak artifact tracking (TrainConfig.keep_best_eval)
        best_key = (-jnp.inf, -jnp.inf)
        best_snap = None

        anneal = cfg.sac.alpha_anneal_steps
        if anneal > 0:
            assert not cfg.sac.auto_alpha, \
                "alpha_anneal_steps and auto_alpha are mutually exclusive"

        rcfg = cfg.random
        dr_adaptive = rcfg.random_dynamics and rcfg.dr_adaptive
        dr_curr = (rcfg.random_dynamics and rcfg.dr_curriculum_steps > 0
                   and not dr_adaptive)
        adr = AdaptiveDRController(rcfg) if dr_adaptive else None
        if dr_curr or dr_adaptive:
            carry = carry._replace(env_state=self._set_dr_scale(
                carry.env_state, rcfg.dr_scale_start))

        while total_steps < max_steps:
            warm = total_steps >= cfg.sac.warmup_steps
            if anneal > 0:
                frac = min(1.0, total_steps / anneal)
                a_now = cfg.sac.alpha + frac * (cfg.sac.alpha_final -
                                                cfg.sac.alpha)
                carry = carry._replace(sac_state=carry.sac_state._replace(
                    log_alpha=jnp.asarray(jnp.log(a_now), jnp.float32)))
            if dr_curr:
                frac = min(1.0, total_steps / rcfg.dr_curriculum_steps)
                scale = rcfg.dr_scale_start + frac * (
                    rcfg.dynamics_scale - rcfg.dr_scale_start)
                carry = carry._replace(env_state=self._set_dr_scale(
                    carry.env_state, scale))
                self.logger.add_scalar("train/dr_scale", scale,
                                       total_steps)
            carry, out = self.rollout_chunk(carry, e_step, chunk_steps, warm)
            if adr is not None:
                scale = adr.update(float(out["success"]))
                carry = carry._replace(env_state=self._set_dr_scale(
                    carry.env_state, scale))
                self.logger.add_scalar("train/dr_scale", scale,
                                       total_steps)
            total_steps += chunk_steps * self.B
            self.logger.add_scalar("train/episode_reward",
                                   float(out["reward"]), total_steps)
            for k in INFO_CHANNELS:
                self.logger.add_scalar(f"train/mean_{k}", float(out[k]),
                                       total_steps)
            if warm:
                self.logger.add_scalar("train/critic_loss",
                                       float(out["critic_loss"]), total_steps)

            # periodic critic reset (plasticity stabilizer,
            # SACConfig.critic_reset_steps; actor + replay kept)
            rst = cfg.sac.critic_reset_steps
            if rst > 0 and total_steps // rst > reset_flag and warm:
                reset_flag = total_steps // rst
                k_rst = jax.random.fold_in(jax.random.key(911), reset_flag)
                sac_state = self.sac.reset_critic(carry.sac_state, k_rst)
                if self.mesh is not None:
                    from paddlerobotics_tpu.parallel import sharding as sh
                    sac_state = sac_state._replace(
                        critic_params=sh.shard_params_tp(
                            self.mesh, sac_state.critic_params),
                        target_critic_params=sh.shard_params_tp(
                            self.mesh, sac_state.target_critic_params),
                        critic_opt=sh.replicate(self.mesh,
                                                sac_state.critic_opt))
                carry = carry._replace(sac_state=sac_state)
                self.logger.add_scalar("train/critic_reset", 1.0,
                                       total_steps)

            # eval window (train.py:370-390)
            if (total_steps + 1) // cfg.train.eval_every_steps > test_flag:
                test_flag = (total_steps + 1) // cfg.train.eval_every_steps
                avg_ret, avg_steps, infos = self.evaluate(
                    carry.sac_state.actor_params, w, b,
                    tcfg.eval_episode_len)
                self.logger.add_scalar("eval/episode_reward",
                                       float(avg_ret), total_steps)
                self.logger.add_scalar("eval/episode_step",
                                       float(avg_steps), total_steps)
                if tcfg.keep_best_eval:
                    key = (float(avg_steps), float(avg_ret))
                    if key > best_key:
                        best_key = key
                        best_snap = (carry.sac_state, w, b,
                                     etg_best_param, total_steps)
                if e_step < tcfg.e_step_max:
                    e_step += tcfg.e_step_growth
                if checkpoint:
                    checkpoints.save(self.outdir, {
                        "sac": carry.sac_state._asdict(),
                        "etg_w": w, "etg_b": b,
                        "etg_param": etg_best_param,
                    }, total_steps)

            # ES phase (train.py:392-437)
            if (cfg.es.popsize > 0 and
                    (total_steps + 1) // cfg.es.es_every_steps > es_flag and
                    total_steps >= cfg.sac.warmup_steps):
                es_flag = (total_steps + 1) // cfg.es.es_every_steps
                rng_host = carry.rng
                best_reward, _ = self._es_baseline(carry, w, b)
                best_param = etg_best_param
                for gi in range(cfg.es.es_train_steps):
                    rng_host, k_ask, k_roll = jax.random.split(rng_host, 3)
                    solutions, es_state = self.solver.ask(es_state, k_ask)
                    ws, bs = self.fit_etg_population(solutions)
                    es_buf = carry.buffer if cfg.es.es_rpm else None
                    fitness, ep_len, es_buf = self.es_eval(
                        carry.sac_state.actor_params, ws, bs, k_roll,
                        cfg.es.es_episode_len, cfg.es.popsize, es_buf)
                    if cfg.es.es_rpm:
                        carry = carry._replace(buffer=es_buf)
                    es_state = self.solver.tell(es_state, fitness)
                    gen_best = int(jnp.argmax(fitness))
                    if float(fitness[gen_best]) > float(best_reward):
                        best_reward = float(fitness[gen_best])
                        best_param = solutions[gen_best]
                    es_gen += 1
                    self.logger.add_scalar("ES/episode_reward",
                                           float(jnp.mean(fitness)), es_gen)
                    self.logger.add_scalar("ES/episode_maxre",
                                           float(jnp.max(fitness)), es_gen)
                    self.logger.add_scalar(
                        "ES/sigma", float(jnp.mean(es_state.sigma)), es_gen)
                etg_best_param = best_param
                w, b = self.fit_etg(etg_best_param)
                if hasattr(self.solver, "reset"):
                    es_state = self.solver.reset(es_state, etg_best_param)
                # refresh env ETG for subsequent SAC rollouts
                w_env, b_env = self._broadcast_etg(w, b)
                carry = carry._replace(
                    env_state=self._set_etg(carry.env_state, w_env, b_env))
                carry = carry._replace(rng=rng_host)

        if tcfg.keep_best_eval and best_snap is not None:
            # final eval-window check so the last policy competes too
            avg_ret, avg_steps, _ = self.evaluate(
                carry.sac_state.actor_params, w, b, tcfg.eval_episode_len)
            if (float(avg_steps), float(avg_ret)) < best_key:
                sac_best, w, b, etg_best_param, at = best_snap
                carry = carry._replace(sac_state=sac_best)
                self.logger.add_scalar("train/best_eval_restored_from",
                                       float(at), total_steps)
        return carry, (w, b, etg_best_param)

    def _place_on_mesh(self, carry: TrainCarry) -> TrainCarry:
        """Initial device placement; the jitted chunk then compiles with
        these shardings and XLA emits the collectives."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from paddlerobotics_tpu.parallel import sharding as sh

        m = self.mesh
        env_state = sh.shard_env_state(m, carry.env_state)
        obs = jax.device_put(
            carry.obs, NamedSharding(m, P("env", None)))
        ss = carry.sac_state
        sac_state = ss._replace(
            actor_params=sh.shard_params_tp(m, ss.actor_params),
            critic_params=sh.shard_params_tp(m, ss.critic_params),
            target_critic_params=sh.shard_params_tp(
                m, ss.target_critic_params),
            actor_opt=sh.replicate(m, ss.actor_opt),
            critic_opt=sh.replicate(m, ss.critic_opt),
            log_alpha=(None if ss.log_alpha is None
                       else sh.replicate(m, ss.log_alpha)),
            alpha_opt=(None if ss.alpha_opt is None
                       else sh.replicate(m, ss.alpha_opt)))
        buf = sh.shard_replay(m, carry.buffer)
        rng = jax.device_put(carry.rng, NamedSharding(m, P()))
        return TrainCarry(env_state, obs, sac_state, buf, rng)

    def _es_baseline(self, carry, w, b):
        """Current-gait baseline episode (train.py:395)."""
        dr0 = (self.cfg.es.es_dyn_scale
               if (self.cfg.es.es_nominal_dyn
                   and self.cfg.random.random_dynamics) else None)
        ret, steps, _ = self.evaluate(
            carry.sac_state.actor_params, w, b, self.cfg.es.es_episode_len,
            dr_scale=dr0)
        return float(ret), float(steps)
