"""The batched A1 quadruped environment (TPU-native `rlschool.make_env`).

Functional rebuild of the reference env stack — rlschool's
``make_env('Quadrupedal', ...)`` + wrapper tower (ETG injection, sensor
obs, reward monitor; mirrored by deployment/envs/EnvWrapper.py:19-25) —
as a pair of pure functions `reset`/`step` over an `EnvState` PyTree:

- `jax.vmap(env.step)` runs thousands of envs per chip;
- episode autoreset is branch-free (`where`-select against a fresh
  reset state), so rollouts `lax.scan` cleanly;
- the ETG residual gait is evaluated on-device from (w, b) carried in the
  state, so an ES population can give *every env its own gait* — the
  reference's `reset(ETG_w, ETG_b)` (train.py:131) without host traffic.

API mapping (reference → here):
  env.reset(ETG_w=w, ETG_b=b)            → env.reset(rng, etg_w, etg_b)
  env.step(a*bound, donef=...)           → env.step(state, a, donef)
  info["velx"/"ETG_act"/reward channels] → info dict (jnp scalars)
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from flax import struct
import jax
import jax.numpy as jnp
import numpy as np

from paddlerobotics_tpu.core import math3d
from paddlerobotics_tpu.core.config import QuadrupedConfig
from paddlerobotics_tpu.core.types import RobotState
from paddlerobotics_tpu.envs import action_filter as af
from paddlerobotics_tpu.envs import randomize, reward as reward_mod, sensors
from paddlerobotics_tpu.etg import fit as etg_fit
from paddlerobotics_tpu.etg import model as etg_model
from paddlerobotics_tpu.sim import a1_model as a1
from paddlerobotics_tpu.sim import robot as robot_mod
from paddlerobotics_tpu.sim import terrain
from paddlerobotics_tpu.sim.dynamics import DynamicsParams
from paddlerobotics_tpu.sim.motor import MotorControlMode

MAX_EPISODE_STEPS = 2048


@struct.dataclass
class EnvState:
    robot: RobotState
    dyn: DynamicsParams
    etg_w: jnp.ndarray        # (3,H)
    etg_b: jnp.ndarray        # (3,)
    step_idx: jnp.ndarray     # () int32
    rng: jax.Array
    last_base_pos: jnp.ndarray
    init_rpy: jnp.ndarray
    filter_state: jnp.ndarray  # (2,12) Butterworth carry
    done: jnp.ndarray          # () bool
    push_salt: jnp.ndarray     # () int32 seed for burst-indexed pushes
    oh_counter: jnp.ndarray    # (12,) consecutive over-torque steps
    motor_on: jnp.ndarray      # (12,) bool overheat latch


class QuadrupedEnv:
    """Static config + precomputed tables; all methods are pure."""

    def __init__(self, config: QuadrupedConfig):
        self.cfg = config
        self.h_fn = terrain.height_fn(config.task)
        # pairing='auto' -> bound for the gallop task, trot otherwise
        self._etg_cfg = etg_model.resolve_pairing(config.etg,
                                                  config.task.task_mode)
        w0, b0 = etg_fit.opt_with_points(config.etg)
        self._w0 = np.asarray(w0)
        self._b0 = np.asarray(b0)
        va, vb = etg_model.phase_tables(config.etg, MAX_EPISODE_STEPS)
        self._va = np.asarray(va)
        self._vb = np.asarray(vb)
        self._filter_b, self._filter_a = af.butter_lowpass_coeffs(
            1.0 / config.sim.control_dt)
        mode = config.train.act_mode
        self.act_offset = np.zeros(12)
        if mode == "pose":
            self.act_bound = np.array([0.1, 0.7, 0.7] * 4)
        elif mode == "torque":
            self.act_bound = np.array([10.0] * 12)
        elif mode == "hybrid":
            # (pos, kp, q̇*, kd, τ_ff) per motor — same mapping as the
            # batched path (see BatchedQuadrupedEnv.__init__).
            kp0 = np.asarray(a1.MOTOR_KP)
            kd0 = np.asarray(a1.MOTOR_KD)
            self.act_bound = np.stack([
                np.full(12, config.train.act_bound), 0.5 * kp0,
                np.full(12, 2.0), 0.5 * kd0, np.full(12, 5.0)],
                axis=1).reshape(60)
            self.act_offset = np.stack([
                np.zeros(12), kp0, np.zeros(12), kd0, np.zeros(12)],
                axis=1).reshape(60)
        else:  # traj
            self.act_bound = np.array([config.train.act_bound] * 12)
        self.control_mode = {
            "torque": MotorControlMode.TORQUE,
            "hybrid": MotorControlMode.HYBRID,
        }.get(mode, MotorControlMode.POSITION)
        self._spawn_height = 0.27

    # -- helpers -------------------------------------------------------------

    @property
    def obs_dim(self) -> int:
        return self.cfg.sensors.base_obs_dim

    @property
    def action_dim(self) -> int:
        return 60 if self.control_mode == MotorControlMode.HYBRID else 12

    def default_etg(self):
        return jnp.asarray(self._w0), jnp.asarray(self._b0)

    def _etg_residual(self, etg_w, etg_b, step_idx):
        v_a = jnp.asarray(self._va)[step_idx % MAX_EPISODE_STEPS]
        v_b = jnp.asarray(self._vb)[step_idx % MAX_EPISODE_STEPS]
        act = etg_model.etg_joint_residual(etg_w, etg_b, v_a, v_b,
                                           self._etg_cfg)
        # gait phase mask from the readout z-delta of each leg
        d = etg_model.foot_deltas(etg_w, etg_b, v_a, v_b, self._etg_cfg)
        swing = d[:, 2] > 0.02
        stance = d[:, 2] <= 0.005
        return act, swing, stance, v_a

    # -- reset ---------------------------------------------------------------

    def reset(self, rng: jax.Array,
              etg_w: Optional[jnp.ndarray] = None,
              etg_b: Optional[jnp.ndarray] = None,
              dyn: Optional[DynamicsParams] = None,
              x_noise: bool = False) -> Tuple[EnvState, jnp.ndarray]:
        """Fresh episode. Mirrors env.reset(ETG_w, ETG_b, x_noise)."""
        rng, k_dyn, k_noise = jax.random.split(rng, 3)
        if etg_w is None or etg_b is None:
            etg_w, etg_b = self.default_etg()
        if dyn is None:
            if self.cfg.random.random_dynamics:
                dyn = randomize.sample_dynamics(
                    k_dyn, scale=self.cfg.random.dynamics_scale,
                    jitter=self.cfg.random.dr_scale_jitter)
            else:
                dyn = DynamicsParams.default()

        h0 = self.h_fn(jnp.zeros(()), jnp.zeros(()))
        spawn = self._spawn_height + h0
        rb = robot_mod.init_robot_state(self.cfg.sim, height=spawn)
        if x_noise:
            dx = 0.02 * jax.random.normal(k_noise, (3,))
            rb = rb.replace(state=rb.state.replace(
                base_pos=rb.state.base_pos + dx * jnp.array([1.0, 1.0, 0.0])))

        state = EnvState(
            robot=rb, dyn=dyn, etg_w=etg_w, etg_b=etg_b,
            step_idx=jnp.zeros((), jnp.int32), rng=rng,
            last_base_pos=rb.state.base_pos,
            init_rpy=math3d.quat_to_euler(rb.state.base_quat),
            filter_state=af.init_filter_state(
                self._filter_b, self._filter_a, rb.state.q),
            done=jnp.zeros((), bool),
            push_salt=jax.random.randint(
                jax.random.fold_in(rng, 5), (), 0,
                jnp.iinfo(jnp.int32).max, dtype=jnp.int32),
            oh_counter=jnp.zeros(12),
            motor_on=jnp.ones(12, bool))
        etg_act, _, _, _ = self._etg_residual(etg_w, etg_b, state.step_idx)
        obs = self._observe(state, etg_act)
        return state, obs

    # -- observation ---------------------------------------------------------

    def _observe(self, state: EnvState, etg_act: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg.sensors
        rb = state.robot
        st = rb.state
        R_b = math3d.quat_to_mat(st.base_quat)
        base_vel_w = R_b @ st.base_lin_vel
        # The reference delays the FULL policy observation — q, qd, base
        # quat and rpy-rate together — at control_latency over the substep
        # ring (_GetControlObservation:1202-1205 reading GetTrueObservation
        # entries; GetBaseRollPitchYaw:623-638 / GetMotorAngles:753-763).
        sdt = self.cfg.sim.substep_dt
        lat = state.dyn.control_latency
        q_obs = robot_mod.delayed_interp(rb.q_hist, lat, sdt)
        qd_obs = robot_mod.delayed_interp(rb.qd_hist, lat, sdt)
        quat_obs = robot_mod.delayed_interp(rb.quat_hist, lat, sdt)
        # pybullet's getEulerFromQuaternion normalizes; the linear blend
        # above shrinks the norm slightly, so renormalize before euler.
        quat_obs = quat_obs / jnp.linalg.norm(quat_obs)
        rpy = math3d.quat_to_euler(quat_obs) - state.init_rpy
        drpy = robot_mod.delayed_interp(rb.w_hist, lat, sdt)
        foot_pose = None
        if cfg.footpose:
            foot_pose = a1.foot_positions_in_base_frame(st.q)
        etg_features = None
        if cfg.etg_obs:
            etg_features = jnp.asarray(self._va)[state.step_idx % MAX_EPISODE_STEPS]
        rng = jax.random.fold_in(state.rng, state.step_idx) if cfg.noise else None
        dyn_vec = None
        if cfg.dynamic_vec:
            dyn_vec = randomize.dynamics_to_normalized(state.dyn)
        return sensors.assemble_obs(
            cfg, base_vel_w, rb.contact.in_contact, rpy, drpy,
            q_obs, qd_obs, etg_act,
            etg_features=etg_features, foot_pose=foot_pose,
            dynamic_vec=dyn_vec,
            ext_force=state.dyn.external_force, rng=rng)

    # -- step ----------------------------------------------------------------

    def step(self, state: EnvState, action: jnp.ndarray,
             donef: jnp.ndarray | bool = False
             ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray, jnp.ndarray,
                        Dict[str, jnp.ndarray]]:
        """One control step. `action` is the *scaled* policy action
        (caller multiplies by act_bound, as train.py:147 does)."""
        cfg = self.cfg
        etg_act, swing, stance, _ = self._etg_residual(
            state.etg_w, state.etg_b, state.step_idx)

        if self.control_mode == MotorControlMode.TORQUE:
            cmd = action
            filt_state = state.filter_state
        elif self.control_mode == MotorControlMode.HYBRID:
            a5 = action.reshape(12, 5)
            q_des = jnp.clip(
                jnp.asarray(a1.INIT_MOTOR_ANGLES) + etg_act + a5[:, 0],
                jnp.asarray(a1.MOTOR_LOWER), jnp.asarray(a1.MOTOR_UPPER))
            cmd = jnp.stack([
                q_des, jnp.maximum(a5[:, 1], 0.0), a5[:, 2],
                jnp.maximum(a5[:, 3], 0.0), a5[:, 4]], axis=1).reshape(60)
            filt_state = state.filter_state
        else:
            target = jnp.asarray(a1.INIT_MOTOR_ANGLES) + etg_act + action
            if self.cfg.train.enable_action_filter:
                target, filt_state = af.filter_step(
                    self._filter_b, self._filter_a, state.filter_state, target)
            else:
                filt_state = state.filter_state
            cmd = jnp.clip(target, jnp.asarray(a1.MOTOR_LOWER),
                           jnp.asarray(a1.MOTOR_UPPER))

        # Sporadic push bursts — identical semantics to the batched path:
        # ~0.26 s push every ~3.9 s, direction/magnitude a pure hash of
        # (burst index, episode salt), constant within a burst.
        rng = state.rng
        dyn = state.dyn
        if cfg.random.random_force:
            rng, _ = jax.random.split(rng)
            burst = state.step_idx // 150
            phase_i = state.step_idx % 150
            active = (phase_i >= 75) & (phase_i < 85)
            u_phi = terrain._hash01(state.push_salt, burst)
            u_mag = terrain._hash01(state.push_salt ^ 0x5BF03635, burst)
            phi = 2 * jnp.pi * u_phi
            mag = u_mag * cfg.random.max_force * active.astype(jnp.float32)
            dyn = dyn.replace(external_force=jnp.stack(
                [mag * jnp.cos(phi), mag * jnp.sin(phi), jnp.zeros(())]))

        dyn_phys = dyn
        if cfg.sim.motor_overheat_protection:
            # latched-off motors exert zero torque (ApplyAction:938-947)
            on_f = state.motor_on.astype(jnp.float32)
            if self.control_mode == MotorControlMode.TORQUE:
                cmd = cmd * on_f
            elif self.control_mode == MotorControlMode.HYBRID:
                c5 = cmd.reshape(12, 5)
                c5 = c5.at[:, 1].mul(on_f).at[:, 3].mul(on_f) \
                     .at[:, 4].mul(on_f)
                cmd = c5.reshape(60)
            else:
                dyn_phys = dyn.replace(motor_kp=dyn.motor_kp * on_f,
                                       motor_kd=dyn.motor_kd * on_f)
        rb = robot_mod.control_step(
            state.robot, cmd, dyn_phys, cfg.sim, self.h_fn,
            control_mode=self.control_mode)
        st = rb.state
        oh_counter, motor_on = state.oh_counter, state.motor_on
        if cfg.sim.motor_overheat_protection:
            over = jnp.abs(rb.applied_torque) > \
                cfg.sim.overheat_shutdown_torque
            oh_counter = jnp.where(over, oh_counter + 1.0, 0.0)
            limit = cfg.sim.overheat_shutdown_time / cfg.sim.control_dt
            motor_on = motor_on & (oh_counter <= limit)

        # reward ingredients
        dx = st.base_pos[0] - state.last_base_pos[0]
        R_b = math3d.quat_to_mat(st.base_quat)
        base_vel_w = R_b @ st.base_lin_vel
        velx = base_vel_w[0]
        up_z = R_b[2, 2]
        foot_h = rb.contact.foot_pos[:, 2] - self.h_fn(
            rb.contact.foot_pos[:, 0], rb.contact.foot_pos[:, 1]) - a1.FOOT_RADIUS
        knee_contacts = rb.contact.knee_penetration > 0
        base_contact = rb.contact.base_penetration > 0

        rew, info = reward_mod.compute_reward(
            cfg.reward, dx, velx, up_z, st.base_ang_vel,
            rb.applied_torque, foot_h, swing.astype(jnp.float32),
            stance.astype(jnp.float32), rb.contact.in_contact,
            knee_contacts, base_contact,
            y_pos=st.base_pos[1],
            vel_y=base_vel_w[1],
            yaw=jnp.arctan2(R_b[1, 0], R_b[0, 0]))

        # termination: rollover / trunk too low / trunk touches ground
        local_h = self.h_fn(st.base_pos[0], st.base_pos[1])
        fallen = (up_z < 0.6) | (st.base_pos[2] - local_h <
                                 cfg.reward.done_height) | base_contact
        done = fallen | jnp.asarray(donef)

        new_state = EnvState(
            robot=rb, dyn=dyn, etg_w=state.etg_w, etg_b=state.etg_b,
            step_idx=state.step_idx + 1, rng=rng,
            last_base_pos=st.base_pos, init_rpy=state.init_rpy,
            filter_state=filt_state, done=done,
            push_salt=state.push_salt,
            oh_counter=oh_counter, motor_on=motor_on)
        # Post-step obs reflects the *next* step's ETG signal (the reference
        # increments iter before get_observation, EnvWrapper.py:103-120);
        # info["ETG_act"] below stays the residual applied THIS step.
        etg_next, _, _, _ = self._etg_residual(
            state.etg_w, state.etg_b, new_state.step_idx)
        obs = self._observe(new_state, etg_next)
        info["ETG_act"] = etg_act
        info["success"] = (velx >= 0.3).astype(jnp.float32)
        return new_state, obs, rew, done, info

    # -- autoreset (for scan-based rollouts) ---------------------------------

    def step_autoreset(self, state: EnvState, action: jnp.ndarray,
                       donef: jnp.ndarray | bool = False):
        """Step; where `done`, replace next state by a fresh reset (branch-
        free). The returned `done` marks the boundary; obs after a done is
        the fresh episode's first obs — the Brax/Isaac convention."""
        nstate, obs, rew, done, info = self.step(state, action, donef)
        rng_new = jax.random.fold_in(state.rng, state.step_idx + 7919)
        # Per-episode semantics: when random_dynamics is on, a fresh
        # episode draws fresh dynamics (dyn=None → resample inside reset);
        # x_noise jitter applies to the fresh spawn as at explicit reset.
        keep_dyn = None if self.cfg.random.random_dynamics else state.dyn
        rstate, robs = self.reset(rng_new, state.etg_w, state.etg_b,
                                  dyn=keep_dyn,
                                  x_noise=self.cfg.train.x_noise)
        next_state = jax.tree.map(
            lambda r, n: jnp.where(
                jnp.reshape(done, (1,) * r.ndim), r, n), rstate, nstate)
        next_obs = jnp.where(done, robs, obs)
        return next_state, next_obs, rew, done, info
