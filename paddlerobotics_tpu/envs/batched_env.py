"""Batch-native quadruped env over the SoA physics hot path.

This is the production environment: a batch of B envs advances as ONE
fused XLA program (sim in batch-minor SoA layout, obs/reward as (B,)
elementwise math, branch-free per-env autoreset). The per-env
`QuadrupedEnv` (quadruped_env.py) remains as the readable reference
implementation; `tests/test_batched_env.py` checks the two agree.

API (batch-first, RL-friendly):
    env = BatchedQuadrupedEnv(config, num_envs)
    state, obs = env.reset(rng)                 # obs (B, obs_dim)
    state, obs, rew, done, info = env.step(state, actions)   # actions (B,12)

ETG weights are carried per env ((3,H,B)), so an ES population can give
every env its own gait, replacing the reference's serial per-candidate
episodes (train.py:404-408) with one batched rollout.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from flax import struct
import jax
import jax.numpy as jnp
import numpy as np

from paddlerobotics_tpu.core.config import QuadrupedConfig
from paddlerobotics_tpu.envs import randomize, sensors
from paddlerobotics_tpu.envs import reward as reward_mod
from paddlerobotics_tpu.etg import fit as etg_fit
from paddlerobotics_tpu.etg import model as etg_model
from paddlerobotics_tpu.etg import oscillator
from paddlerobotics_tpu.sim import a1_model as a1
from paddlerobotics_tpu.sim import sbatch, terrain
from paddlerobotics_tpu.sim.sbatch import BDynParams, BRobot, F32

_DEFAULT_FEET = etg_model._feet()  # (4,3)


@struct.dataclass
class BEnvState:
    robot: BRobot
    dyn: BDynParams
    etg_w: jnp.ndarray      # (3,H,B)
    etg_b: jnp.ndarray      # (3,B)
    step_idx: jnp.ndarray   # (B,) int32
    rng: jax.Array          # single key, folded per step
    last_x: jnp.ndarray     # (B,) previous base x
    done: jnp.ndarray       # (B,) bool
    filter_z: jnp.ndarray   # (2,12,B) Butterworth carry (action filter)
    push_salt: jnp.ndarray  # () int32 seed for burst-indexed random pushes
    oh_counter: jnp.ndarray  # (12,B) consecutive over-torque control steps
    motor_on: jnp.ndarray    # (12,B) bool, overheat latch (False = off)
    dr_scale: jnp.ndarray    # () DR curriculum scale on the normalized
                             # dynamics sample (traced — the trainer can
                             # anneal it without recompiling)


def _soa_ik(fx, fy, fz):
    """SoA leg IK: foot position in hip frame (4,B) comps → angles (4,B)×3.

    Same closed form as a1.py:97-110, componentwise.
    """
    l_hip = jnp.asarray(a1.HIP_SIGNS, F32).reshape(4, 1) * a1.L_HIP
    l_up = l_low = a1.L_UP
    d2 = fx * fx + fy * fy + fz * fz
    cos_knee = (d2 - l_hip * l_hip - l_low ** 2 - l_up ** 2) / (2 * l_low * l_up)
    theta_knee = -jnp.arccos(jnp.clip(cos_knee, -1.0, 1.0))
    l = jnp.sqrt(jnp.maximum(
        l_up ** 2 + l_low ** 2 + 2 * l_up * l_low * jnp.cos(theta_knee), 1e-12))
    theta_hip = jnp.arcsin(jnp.clip(-fx / l, -1.0, 1.0)) - theta_knee * 0.5
    c_eff = jnp.cos(theta_hip + theta_knee * 0.5)
    c1 = l_hip * fy - l * c_eff * fz
    s1 = l * c_eff * fy + l_hip * fz
    theta_ab = jnp.arctan2(s1, c1)
    return theta_ab, theta_hip, theta_knee


class BatchedQuadrupedEnv:
    def __init__(self, config: QuadrupedConfig, num_envs: int):
        self.cfg = config
        self.B = num_envs
        self.h_fn = terrain.height_fn(config.task)
        # Policy-obs latency blend reach (SimConfig.obs_latency_taps):
        # full ring under DR (control_latency randomized 0-80 ms), else
        # just enough taps to cover the static nominal latency (2 at the
        # 2 ms default).
        t = config.sim.obs_latency_taps
        if t == 0:
            if config.random.random_dynamics:
                t = None
            else:
                import math
                t = max(2, 1 + math.ceil(
                    config.sim.control_latency / config.sim.substep_dt))
        self._obs_taps = t
        # Ring length: when the deepest reader (policy-obs blend taps +
        # pd-latency taps) stays within ONE control step's substeps, the
        # ring IS the megakernel's per-substep snapshot stack — each
        # control step fully overwrites it (ring_push fast path, zero
        # copy). Under DR (full-ring blend) size it to the latency
        # buffer, rounded up to a multiple of n so block writes never
        # wrap (physics_step.py invariant).
        n = config.sim.action_repeat
        pd = sbatch.pd_delay_taps(config.sim, 10 ** 9)
        need = (config.sim.latency_buffer_len if t is None
                else max(t, pd[0] if pd else 1))
        self._hist_len = need if need <= n else -(-need // n) * n
        # pairing='auto' -> bound for the gallop task, trot otherwise
        self._etg_cfg = etg_model.resolve_pairing(config.etg,
                                                  config.task.task_mode)
        self._leg_group = etg_model.leg_phase_group(
            self._etg_cfg.pairing).astype(np.int32)
        w0, b0 = etg_fit.opt_with_points(config.etg)
        self._w0 = np.asarray(w0, np.float32)
        self._b0 = np.asarray(b0, np.float32)
        # RBF centers as (H,1) constants for SoA phase features
        self._centers = oscillator.centers(config.etg).astype(np.float32)
        mode = config.train.act_mode
        self.act_offset = np.zeros(12, np.float32)
        if mode == "pose":
            self.act_bound = np.array([0.1, 0.7, 0.7] * 4, np.float32)
        elif mode == "torque":
            self.act_bound = np.array([10.0] * 12, np.float32)
        elif mode == "hybrid":
            # Full HYBRID motor interface (laikago_motor.py:33-37): per
            # motor (pos, kp, q̇*, kd, τ_ff). Policy actions in [-1,1]⁶⁰
            # map to  offset + bound·a : position residual ±act_bound
            # around init+ETG (as in traj mode), gains centered on the A1
            # defaults, velocity target ±2 rad/s, feedforward ±5 N·m.
            kp0 = np.asarray(a1.MOTOR_KP, np.float32)
            kd0 = np.asarray(a1.MOTOR_KD, np.float32)
            self.act_bound = np.stack([
                np.full(12, config.train.act_bound, np.float32),
                0.5 * kp0, np.full(12, 2.0, np.float32),
                0.5 * kd0, np.full(12, 5.0, np.float32)], axis=1
            ).reshape(60)
            self.act_offset = np.stack([
                np.zeros(12, np.float32), kp0,
                np.zeros(12, np.float32), kd0,
                np.zeros(12, np.float32)], axis=1).reshape(60)
        else:
            self.act_bound = np.full(12, config.train.act_bound, np.float32)
        self.torque_mode = mode == "torque"
        self.hybrid_mode = mode == "hybrid"
        h0 = float(np.asarray(self.h_fn(jnp.zeros(()), jnp.zeros(()))))
        self._spawn_height = 0.27 + h0
        from paddlerobotics_tpu.envs import action_filter as af

        self._af = af
        self._fb, self._fa = af.butter_lowpass_coeffs(
            1.0 / config.sim.control_dt)
        # per-leg stance offsets (recovered from the reference's golden
        # gait — see etg/model.py STANCE_OFFSET_*), step_y-parameterized
        self._lat = (etg_model.STANCE_OFFSET_Y +
                     (config.etg.step_y - etg_model.REFERENCE_STEP_Y) *
                     np.asarray(etg_model.LATERAL_SIGN)).astype(np.float32)
        self._stx = etg_model.STANCE_OFFSET_X.astype(np.float32)

    @property
    def obs_dim(self) -> int:
        return self.cfg.sensors.base_obs_dim

    @property
    def action_dim(self) -> int:
        return 60 if self.hybrid_mode else 12

    def default_etg(self):
        """Population-shared default (w, b) broadcast to (3,H,B)/(3,B)."""
        w = jnp.broadcast_to(jnp.asarray(self._w0)[..., None],
                             self._w0.shape + (self.B,))
        b = jnp.broadcast_to(jnp.asarray(self._b0)[..., None],
                             (3, self.B))
        return w, b

    # -- ETG (SoA) ------------------------------------------------------------

    def _phase_features(self, t: jnp.ndarray) -> jnp.ndarray:
        """V(t) for per-env times t (B,) → (H,B)."""
        cfg = self.cfg.etg
        p1 = cfg.amp * jnp.sin(2 * jnp.pi / cfg.T * t + cfg.phase[0])
        p2 = cfg.amp * jnp.sin(2 * jnp.pi / cfg.T2 * t + cfg.phase[1])
        u = jnp.asarray(self._centers)  # (H,2)
        d2 = (p1[None, :] - u[:, 0:1]) ** 2 + (p2[None, :] - u[:, 1:2]) ** 2
        return jnp.exp(-d2 / cfg.sigma_sq)

    def _etg_residual(self, etg_w, etg_b, step_idx):
        """ETG joint residual (12,B), swing/stance masks (4,B), delta z."""
        dt = self.cfg.etg.dt
        t = step_idx.astype(F32) * dt
        v_a = self._phase_features(t)                      # (H,B)
        v_b = self._phase_features(t + self.cfg.etg.T / 2)
        # readout: delta[x] = Σ_h w[x,h]·V[h] + b[x]
        d_a = jnp.einsum("xhb,hb->xb", etg_w, v_a) + etg_b   # (3,B)
        d_b = jnp.einsum("xhb,hb->xb", etg_w, v_b) + etg_b
        group = jnp.asarray(self._leg_group)                 # (4,)
        sel = (group[:, None] == 0)
        dx = jnp.where(sel, d_a[0][None, :], d_b[0][None, :]) + \
            jnp.asarray(self._stx)[:, None]                     # (4,B)
        dy = jnp.where(sel, d_a[1][None, :], d_b[1][None, :]) + \
            jnp.asarray(self._lat)[:, None]
        dz = jnp.where(sel, d_a[2][None, :], d_b[2][None, :])
        feet = jnp.asarray(_DEFAULT_FEET, F32)               # (4,3)
        hips = jnp.asarray(a1.HIP_OFFSETS, F32)
        fx = feet[:, 0:1] - hips[:, 0:1] + dx
        fy = feet[:, 1:2] - hips[:, 1:2] + dy
        fz = feet[:, 2:3] - hips[:, 2:3] + dz
        t_ab, t_hip, t_knee = _soa_ik(fx, fy, fz)
        q = jnp.stack([t_ab, t_hip, t_knee], axis=1).reshape(12, -1)
        etg_act = q - jnp.asarray(a1.INIT_MOTOR_ANGLES, F32)[:, None]
        swing = dz > 0.02
        stance = dz <= 0.005
        return etg_act, swing, stance, v_a

    # -- reset ----------------------------------------------------------------

    def _fresh_robot(self) -> BRobot:
        return sbatch.init_robot(self.B, height=self._spawn_height,
                                 hist_len=self._hist_len)

    def reset(self, rng: jax.Array,
              etg_w: Optional[jnp.ndarray] = None,
              etg_b: Optional[jnp.ndarray] = None,
              dyn: Optional[BDynParams] = None,
              dr_scale: jnp.ndarray | float | None = None
              ) -> Tuple[BEnvState, jnp.ndarray]:
        if etg_w is None or etg_b is None:
            etg_w, etg_b = self.default_etg()
        if dr_scale is None:
            dr_scale = self.cfg.random.dynamics_scale
        dr_scale = jnp.asarray(dr_scale, F32)
        if dyn is None:
            if self.cfg.random.random_dynamics:
                keys = jax.random.split(rng, self.B)
                dp = jax.vmap(lambda k: randomize.sample_dynamics(
                    k, scale=dr_scale,
                    jitter=self.cfg.random.dr_scale_jitter))(keys)
                dyn = BDynParams.from_leading(dp)
            else:
                dyn = BDynParams.default(self.B)
        elif self._obs_taps is not None:
            # Injected dynamics (dynamics ID, feasibility probes) must
            # fit inside the tapped obs-latency blend reach; beyond it
            # delayed_obs silently clips to near-zero latency. Concrete
            # (non-traced) latencies are checked here; traced callers
            # are expected to set obs_latency_taps=latency_buffer_len
            # (core/config.py:205-211).
            import warnings
            lat = getattr(dyn, "control_latency", None)
            if lat is not None and not isinstance(
                    lat, jax.core.Tracer):
                reach = (self._obs_taps - 1) * self.cfg.sim.substep_dt
                lat_max = float(jnp.max(jnp.asarray(lat)))
                if lat_max > reach + 1e-9:
                    warnings.warn(
                        f"reset(dyn=...) injects control_latency up to "
                        f"{lat_max * 1e3:.1f} ms but obs_latency_taps="
                        f"{self._obs_taps} only reaches "
                        f"{reach * 1e3:.1f} ms — the blend will clip. "
                        f"Set SimConfig.obs_latency_taps="
                        f"latency_buffer_len for injected latencies.",
                        stacklevel=2)
        rb = self._fresh_robot()
        if self.cfg.train.x_noise:
            # reset-position jitter (train.py --x_noise; reset kwarg
            # x_noise at train.py:131)
            kx = jax.random.fold_in(rng, jnp.asarray(29, jnp.uint32))
            dxy = 0.02 * jax.random.normal(kx, (2, self.B))
            pos = rb.s.pos.at[0].add(dxy[0]).at[1].add(dxy[1])
            rb = rb.replace(s=rb.s.replace(pos=pos))
        state = BEnvState(
            robot=rb, dyn=dyn, etg_w=etg_w, etg_b=etg_b,
            step_idx=jnp.zeros((self.B,), jnp.int32), rng=rng,
            last_x=rb.s.pos[0], done=jnp.zeros((self.B,), bool),
            filter_z=self._af.init_filter_state(self._fb, self._fa, rb.s.q),
            push_salt=jax.random.randint(
                jax.random.fold_in(rng, jnp.asarray(5, jnp.uint32)),
                (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32),
            oh_counter=jnp.zeros((12, self.B), F32),
            motor_on=jnp.ones((12, self.B), bool),
            dr_scale=dr_scale)
        etg_act, _, _, v_a = self._etg_residual(etg_w, etg_b, state.step_idx)
        return state, self._observe(state, etg_act, v_a)

    # -- observation (SoA → (B, obs_dim)) -------------------------------------

    def _observe(self, state: BEnvState, etg_act: jnp.ndarray,
                 etg_features: jnp.ndarray | None = None) -> jnp.ndarray:
        cfg = self.cfg.sensors
        rb = state.robot
        s = rb.s
        Rb = sbatch.quat_to_mat_cols(s.quat)
        from paddlerobotics_tpu.ops import smallalg as sa
        vel_w = sa.mv(Rb, [s.v[0], s.v[1], s.v[2]])   # world base velocity
        # The reference delays the FULL policy observation — q, qd, base
        # quat and rpy-rate — at control_latency over the substep-
        # resolution ring (_GetControlObservation:1202-1205;
        # GetBaseRollPitchYaw:623-638, GetMotorAngles:753-763).
        q_obs, qd_obs, quat_obs, drpy = sbatch.delayed_obs(
            rb, state.dyn.control_latency, self.cfg.sim.substep_dt,
            taps=self._obs_taps)
        # rpy from the delayed quaternion (spawn rpy = 0); renormalize the
        # linear blend as pybullet's getEulerFromQuaternion does.
        inv_n = jax.lax.rsqrt(jnp.sum(quat_obs * quat_obs, axis=0) + 1e-12)
        qw, qx, qy, qz = (quat_obs[0] * inv_n, quat_obs[1] * inv_n,
                          quat_obs[2] * inv_n, quat_obs[3] * inv_n)
        roll = jnp.arctan2(2 * (qw * qx + qy * qz),
                           1 - 2 * (qx * qx + qy * qy))
        pitch = jnp.arcsin(jnp.clip(2 * (qw * qy - qz * qx), -1.0, 1.0))
        yaw = jnp.arctan2(2 * (qw * qz + qx * qy),
                          1 - 2 * (qy * qy + qz * qz))

        vel_s = jnp.stack(vel_w)
        rpy = jnp.stack([roll, pitch, yaw])
        if cfg.noise:
            # Per-channel noise on RAW values before normalization —
            # identical stds to the per-env path (sensors.NOISE_STD,
            # minitaur._AddSensorNoise semantics).
            k = jax.random.fold_in(state.rng,
                                   jnp.sum(state.step_idx) % 65536)
            ks = jax.random.split(k, 5)
            nz = lambda kk, x, s_: x + s_ * jax.random.normal(kk, x.shape)
            vel_s = nz(ks[0], vel_s, sensors.NOISE_STD["dis"])
            rpy = nz(ks[1], rpy, sensors.NOISE_STD["rpy"])
            drpy = nz(ks[2], drpy, sensors.NOISE_STD["drpy"])
            q_obs = nz(ks[3], q_obs, sensors.NOISE_STD["q"])
            qd_obs = nz(ks[4], qd_obs, sensors.NOISE_STD["qd"])

        parts = []  # each (k, B)
        if cfg.dis:
            parts.append(vel_s)
        if cfg.contact:
            parts.append(rb.contact.foot_contact.astype(F32))
        if cfg.imu == 1:
            if cfg.normal:
                parts.append(jnp.concatenate([rpy / 0.1, drpy / 0.5]))
            else:
                parts.append(jnp.concatenate([rpy, drpy]))
        elif cfg.imu == 2:
            parts.append(drpy / 0.5 if cfg.normal else drpy)
        if cfg.motor == 1:
            q0 = jnp.asarray(a1.INIT_MOTOR_ANGLES, F32)[:, None]
            qn = (q_obs - q0) / 0.1 if cfg.normal else q_obs
            parts.append(jnp.concatenate([qn, qd_obs]))
        elif cfg.motor == 2:
            q0 = jnp.asarray(a1.INIT_MOTOR_ANGLES, F32)[:, None]
            parts.append((q_obs - q0) / 0.1 if cfg.normal else q_obs)
        if cfg.etg:
            mean = jnp.asarray(sensors.ETG_MEAN, F32)[:, None]
            std = jnp.asarray(sensors.ETG_STD, F32)[:, None]
            parts.append((etg_act - mean) / std if cfg.normal else etg_act)
        if cfg.etg_obs and etg_features is not None:
            parts.append(etg_features)              # (H,B) phase features
        if cfg.footpose:
            # foot positions in base frame: R_bᵀ (p_w − base)  (3,4,B)→(12,B)
            fp = rb.contact.foot_pos
            dx = fp[0] - s.pos[0]
            dy = fp[1] - s.pos[1]
            dz = fp[2] - s.pos[2]
            bx = Rb[0][0] * dx + Rb[1][0] * dy + Rb[2][0] * dz
            by = Rb[0][1] * dx + Rb[1][1] * dy + Rb[2][1] * dz
            bz = Rb[0][2] * dx + Rb[1][2] * dy + Rb[2][2] * dz
            parts.append(jnp.stack([bx, by, bz], axis=1).reshape(12, -1))
        if cfg.dynamic_vec:
            # normalized dynamics echo, (48,B) in SoA layout
            parts.append(randomize.dynamics_to_normalized(state.dyn))
        if cfg.force_vec:
            parts.append(state.dyn.external_force)
        obs = jnp.concatenate(parts, axis=0)        # (obs_dim, B)
        return obs.T                                 # (B, obs_dim)

    # -- step -----------------------------------------------------------------

    def step(self, state: BEnvState, actions: jnp.ndarray,
             donef: jnp.ndarray | bool = False, autoreset: bool = True):
        """actions (B,12), already scaled by act_bound (train.py:147).

        Returns (state, obs (B,obs), reward (B,), done (B,), info)."""
        cfg = self.cfg
        B = self.B
        act = actions.T.astype(F32)                 # (12,B)
        etg_act, swing, stance, _ = self._etg_residual(
            state.etg_w, state.etg_b, state.step_idx)

        filter_z = state.filter_z
        qd_ref = tau_ff = None
        if self.torque_mode:
            cmd = act
        elif self.hybrid_mode:
            # (60,B) → per-motor (pos, kp, q̇*, kd, τ_ff); position target
            # is the usual init+ETG+residual, gains/vel/ff pass to the
            # hybrid motor law (laikago_motor.py:152-166).
            a5 = act.reshape(12, 5, -1)
            cmd = jnp.asarray(a1.INIT_MOTOR_ANGLES, F32)[:, None] + \
                etg_act + a5[:, 0]
            cmd = jnp.clip(cmd, jnp.asarray(a1.MOTOR_LOWER, F32)[:, None],
                           jnp.asarray(a1.MOTOR_UPPER, F32)[:, None])
            qd_ref, tau_ff = a5[:, 2], a5[:, 4]
        else:
            cmd = jnp.asarray(a1.INIT_MOTOR_ANGLES, F32)[:, None] + etg_act + act
            if cfg.train.enable_action_filter:
                # Butterworth smoothing of the position target
                # (ActionFilterWrapper, EnvWrapper.py:287-291)
                cmd, filter_z = self._af.filter_step(
                    self._fb, self._fa, filter_z, cmd)
            cmd = jnp.clip(cmd, jnp.asarray(a1.MOTOR_LOWER, F32)[:, None],
                           jnp.asarray(a1.MOTOR_UPPER, F32)[:, None])

        rng = jax.random.fold_in(state.rng, jnp.asarray(17, jnp.uint32))
        dyn = state.dyn
        if cfg.random.random_force:
            # Sporadic pushes (perturbation bursts, not a constant wind):
            # ~0.26 s push every ~3.9 s. Direction/magnitude are a pure
            # hash of (env, burst_index, episode_salt), so they are
            # genuinely constant across a burst's steps and resample at
            # each new burst — no per-step rng leakage.
            burst = state.step_idx // 150              # (B,)
            phase = state.step_idx % 150
            # mid-cycle window so a fresh episode is never pushed at spawn
            active = (phase >= 75) & (phase < 85)
            env_ix = jnp.arange(B, dtype=jnp.int32)
            # Knuth multiplicative constant as signed int32
            seed = env_ix * jnp.int32(-1640531535) + state.push_salt
            u_phi = terrain._hash01(seed, burst)
            u_mag = terrain._hash01(seed ^ 0x5BF03635, burst)
            phi = 2 * jnp.pi * u_phi
            mag = u_mag * cfg.random.max_force * active.astype(F32)
            dyn = dyn._replace(external_force=jnp.stack(
                [mag * jnp.cos(phi), mag * jnp.sin(phi), jnp.zeros(B)]))

        dyn_phys = dyn
        if self.hybrid_mode:
            # commanded gains drive the physics but are NOT persisted into
            # the env state (dynamics echo / DR keep the sampled gains)
            dyn_phys = dyn._replace(motor_kp=jnp.maximum(a5[:, 1], 0.0),
                                    motor_kd=jnp.maximum(a5[:, 3], 0.0))
        if cfg.sim.motor_overheat_protection:
            # latched-off motors exert zero torque (ApplyAction:938-947)
            on_f = state.motor_on.astype(F32)
            if self.torque_mode:
                cmd = cmd * on_f
            else:
                dyn_phys = dyn_phys._replace(
                    motor_kp=dyn_phys.motor_kp * on_f,
                    motor_kd=dyn_phys.motor_kd * on_f)
                if tau_ff is not None:
                    tau_ff = tau_ff * on_f
        if cfg.sim.use_pallas:
            from paddlerobotics_tpu.ops.pallas.physics_step import \
                control_step_pallas

            rb = control_step_pallas(
                state.robot, cmd, dyn_phys, cfg.sim, self.h_fn,
                torque_mode=self.torque_mode, qd_ref=qd_ref, tau_ff=tau_ff,
                block_b=min(cfg.sim.pallas_block, self.B),
                # off-TPU (CI/CPU) the megakernel runs in interpret mode
                interpret=jax.default_backend() != "tpu")
        else:
            rb = sbatch.control_step(
                state.robot, cmd, dyn_phys, cfg.sim, self.h_fn,
                torque_mode=self.torque_mode, qd_ref=qd_ref, tau_ff=tau_ff)
        s = rb.s

        # reward terms (all (B,)) — shared single-source shapes
        # (envs/reward.py works on axis-0 reductions, so the SoA
        # batch-minor layout flows straight through)
        dx = s.pos[0] - state.last_x
        Rb = sbatch.quat_to_mat_cols(s.quat)
        velx = Rb[0][0] * s.v[0] + Rb[0][1] * s.v[1] + Rb[0][2] * s.v[2]
        up_z = Rb[2][2]
        foot_h = (rb.contact.foot_pos[2] -
                  self.h_fn(rb.contact.foot_pos[0], rb.contact.foot_pos[1]) -
                  a1.FOOT_RADIUS)                   # (4,B)
        vel_y = Rb[1][0] * s.v[0] + Rb[1][1] * s.v[1] + Rb[1][2] * s.v[2]
        yaw = jnp.arctan2(Rb[1][0], Rb[0][0])
        reward, rinfo = reward_mod.compute_reward(
            cfg.reward, dx, velx, up_z, s.w, rb.tau, foot_h,
            swing.astype(F32), stance.astype(F32),
            rb.contact.foot_contact, rb.contact.knee_contact,
            rb.contact.base_contact,
            y_pos=s.pos[1], vel_y=vel_y, yaw=yaw)
        r_torso, r_up, r_feet, r_tau = (rinfo["torso"], rinfo["up"],
                                        rinfo["feet"], rinfo["tau"])
        r_stand, r_badfoot, r_footcontact = (
            rinfo["stand"], rinfo["badfoot"], rinfo["footcontact"])

        local_h = self.h_fn(s.pos[0], s.pos[1])
        fallen = ((up_z < 0.6) |
                  (s.pos[2] - local_h < cfg.reward.done_height) |
                  rb.contact.base_contact)
        done = fallen | jnp.broadcast_to(jnp.asarray(donef), fallen.shape)

        oh_counter, motor_on = state.oh_counter, state.motor_on
        if cfg.sim.motor_overheat_protection:
            # per-CONTROL-step approximation of minitaur.py:894-901
            over = jnp.abs(rb.tau) > cfg.sim.overheat_shutdown_torque
            oh_counter = jnp.where(over, oh_counter + 1.0, 0.0)
            limit = cfg.sim.overheat_shutdown_time / cfg.sim.control_dt
            motor_on = motor_on & (oh_counter <= limit)

        new_state = BEnvState(
            robot=rb, dyn=dyn, etg_w=state.etg_w, etg_b=state.etg_b,
            step_idx=state.step_idx + 1, rng=rng,
            last_x=s.pos[0], done=done, filter_z=filter_z,
            push_salt=state.push_salt,
            oh_counter=oh_counter, motor_on=motor_on,
            dr_scale=state.dr_scale)

        if autoreset:
            fresh = self._fresh_robot()
            if cfg.train.x_noise:
                # reset-position jitter for auto-resetting envs, matching
                # the explicit reset() path (train.py --x_noise)
                kx = jax.random.fold_in(rng, jnp.asarray(31, jnp.uint32))
                dxy = 0.02 * jax.random.normal(kx, (2, B))
                pos = fresh.s.pos.at[0].add(dxy[0]).at[1].add(dxy[1])
                fresh = fresh.replace(s=fresh.s.replace(pos=pos))
            if cfg.train.spawn_x_max > 0:
                # spawn-on-course curriculum (TrainConfig.spawn_x_max):
                # respawns land mid-course with heading/lateral jitter so
                # replay covers the course, not just the approach
                ks = jax.random.fold_in(rng, jnp.asarray(37, jnp.uint32))
                k1, k2, k3 = jax.random.split(ks, 3)
                on = (jnp.arange(B) <
                      int(cfg.train.spawn_x_frac * B)).astype(F32)
                xs = on * jax.random.uniform(
                    k1, (B,), minval=0.0, maxval=cfg.train.spawn_x_max)
                ys = on * jax.random.uniform(
                    k2, (B,), minval=-cfg.train.spawn_y,
                    maxval=cfg.train.spawn_y)
                pos = fresh.s.pos.at[0].add(xs).at[1].add(ys)
                # terrain-relative spawn height
                pos = pos.at[2].add(self.h_fn(pos[0], pos[1]))
                quat = fresh.s.quat
                if cfg.train.spawn_yaw > 0:
                    psi = on * jax.random.uniform(
                        k3, (B,), minval=-cfg.train.spawn_yaw,
                        maxval=cfg.train.spawn_yaw)
                    # fresh quat is identity → yaw-only rotation
                    quat = jnp.stack([
                        jnp.cos(psi / 2), jnp.zeros_like(psi),
                        jnp.zeros_like(psi), jnp.sin(psi / 2)])
                fresh = fresh.replace(s=fresh.s.replace(pos=pos,
                                                        quat=quat))
            sel_b_last = lambda f, n: jnp.where(
                done.reshape((1,) * (n.ndim - 1) + (-1,)), f, n)
            rb_next = jax.tree.map(sel_b_last, fresh, new_state.robot)
            # hist_head is a shared () scalar — keep the live head (a
            # fresh ring is row-uniform, so any head reads the same
            # values for reset envs)
            rb_next = rb_next.replace(
                hist_head=new_state.robot.hist_head)
            fresh_fz = self._af.init_filter_state(self._fb, self._fa,
                                                  fresh.s.q)
            dyn_next = new_state.dyn._replace(
                external_force=jnp.where(done[None, :], 0.0,
                                         new_state.dyn.external_force))
            if cfg.random.random_dynamics:
                # Per-EPISODE domain randomization: the reference resamples
                # dynamics at every env.reset() when random_dynamics is on;
                # under autoreset that means each finished env draws a
                # fresh set here, not only at the explicit reset().
                kd = jax.random.split(
                    jax.random.fold_in(rng, jnp.asarray(23, jnp.uint32)),
                    B)
                dp = jax.vmap(lambda k: randomize.sample_dynamics(
                    k, scale=state.dr_scale,
                    jitter=self.cfg.random.dr_scale_jitter))(kd)
                fresh_dyn = BDynParams.from_leading(dp)._replace(
                    external_force=jnp.zeros((3, B), F32))
                dyn_next = jax.tree.map(sel_b_last, fresh_dyn, dyn_next)
            new_state = new_state.replace(
                robot=rb_next,
                dyn=dyn_next,
                step_idx=jnp.where(done, 0, new_state.step_idx),
                last_x=jnp.where(done, fresh.s.pos[0], new_state.last_x),
                filter_z=jnp.where(done[None, None, :], fresh_fz,
                                   new_state.filter_z),
                oh_counter=jnp.where(done[None, :], 0.0,
                                     new_state.oh_counter),
                motor_on=jnp.where(done[None, :], True,
                                   new_state.motor_on))

        etg_next, _, _, v_next = self._etg_residual(
            new_state.etg_w, new_state.etg_b, new_state.step_idx)
        obs = self._observe(new_state, etg_next, v_next)
        info = {
            "torso": r_torso, "up": r_up, "feet": r_feet, "tau": r_tau,
            "stand": r_stand, "badfoot": r_badfoot,
            "footcontact": r_footcontact, "velx": velx, "rew": reward,
            "ETG_act": etg_act.T, "success": (velx >= 0.3).astype(F32),
        }
        return new_state, obs, reward, done, info
