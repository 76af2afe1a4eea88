"""Robot control-step: action repeat, interpolation, latency, PD, dynamics.

Functional rebuild of Minitaur.Step/_StepInternal/ApplyAction/
ReceiveObservation (deployment/robots/minitaur.py:242-258, 904-947,
1151-1193): one call advances a control step (default 26 ms) by
`action_repeat` physics substeps inside a `lax.scan`, so a vmapped batch
of envs compiles to a single fused XLA loop.

State the reference keeps in Python (`_observation_history` deque with
latency interpolation, `_last_action`) lives in fixed-shape arrays on
`RobotState` (core/types.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from paddlerobotics_tpu.core.config import SimConfig
from paddlerobotics_tpu.core.types import QuadState, RobotState
from paddlerobotics_tpu.sim import a1_model as a1
from paddlerobotics_tpu.sim import contact as contact_mod
from paddlerobotics_tpu.sim import dynamics, motor
from paddlerobotics_tpu.sim.dynamics import DynamicsParams
from paddlerobotics_tpu.sim.motor import MotorControlMode


def delayed_interp(hist: jnp.ndarray, latency: jnp.ndarray,
                   substep_dt: float) -> jnp.ndarray:
    """Latency-interpolated snapshot from a (L, …) newest-first ring
    (minitaur._GetDelayedObservation:1172-1193).

    History index 0 is the newest snapshot; entry i is i substeps old.
    Linear interpolation between the two snapshots bracketing `latency`
    (quaternions blend componentwise, exactly as the reference blends its
    flat observation vector).
    """
    L = hist.shape[0]
    f = jnp.clip(latency / substep_dt, 0.0, L - 1.001)
    i0 = jnp.floor(f).astype(jnp.int32)
    frac = f - i0
    h0 = jnp.take(hist, i0, axis=0)
    h1 = jnp.take(hist, jnp.minimum(i0 + 1, L - 1), axis=0)
    return h0 * (1 - frac) + h1 * frac


def delayed_motor_obs(q_hist: jnp.ndarray, qd_hist: jnp.ndarray,
                      latency: jnp.ndarray, substep_dt: float):
    """Latency-interpolated (q, qd) (minitaur._GetPDObservation
    semantics over the substep ring)."""
    return (delayed_interp(q_hist, latency, substep_dt),
            delayed_interp(qd_hist, latency, substep_dt))


def init_robot_state(cfg: SimConfig, height: float = 0.32,
                     q0: jnp.ndarray | None = None) -> RobotState:
    """Standing-start RobotState with filled history buffers."""
    state = dynamics.default_state(height=height, motor_angles=q0)
    L = cfg.latency_buffer_len
    poses = dynamics.world_poses(state)
    zeros4 = jnp.zeros((4,))
    from paddlerobotics_tpu.core.types import ContactState
    contact = ContactState(
        foot_pos=poses["o_foot"], foot_vel=jnp.zeros((4, 3)),
        forces=jnp.zeros((4, 3)), penetration=zeros4,
        in_contact=zeros4 > 1, knee_penetration=zeros4,
        base_penetration=jnp.asarray(0.0))
    return RobotState(
        state=state,
        q_hist=jnp.tile(state.q[None, :], (L, 1)),
        qd_hist=jnp.zeros((L, 12)),
        quat_hist=jnp.tile(state.base_quat[None, :], (L, 1)),
        w_hist=jnp.zeros((L, 3)),
        last_action=state.q,
        applied_torque=jnp.zeros(12),
        contact=contact)


def substep(robot: RobotState, motor_command: jnp.ndarray,
            params: DynamicsParams, cfg: SimConfig, h_fn,
            control_mode: MotorControlMode = MotorControlMode.POSITION
            ) -> RobotState:
    """One physics substep (minitaur._StepInternal:242-246)."""
    state = robot.state
    poses = dynamics.world_poses(state)

    # PD input: the reference's _GetPDObservation (minitaur.py:1195-1199)
    # at pd_latency — which A1 leaves at the 0.0 default (a1.py:225-273),
    # i.e. the current pre-substep state. control_latency delays only the
    # POLICY observation, not this loop.
    if cfg.pd_latency > 0.0:
        q_obs, qd_obs = delayed_motor_obs(
            robot.q_hist, robot.qd_hist, cfg.pd_latency, cfg.substep_dt)
    else:
        q_obs, qd_obs = state.q, state.qd
    if control_mode == MotorControlMode.POSITION:
        tau = motor.pd_torque(motor_command, q_obs, qd_obs,
                              params.motor_kp, params.motor_kd,
                              jnp.asarray(a1.TORQUE_LIMIT))
    elif control_mode == MotorControlMode.TORQUE:
        tau = motor.torque_passthrough(motor_command,
                                       jnp.asarray(a1.TORQUE_LIMIT))
    else:
        tau = motor.hybrid_torque(motor_command, q_obs, qd_obs,
                                  jnp.asarray(a1.TORQUE_LIMIT))

    contact_state, foot_f, knee_f, base_f = contact_mod.compute_contacts(
        state, poses, h_fn, params, cfg)
    a0, qdd = dynamics.forward_dynamics(
        state, tau, foot_f, knee_f, base_f, params, poses)
    new_state = dynamics.integrate(
        state, a0, qdd, cfg.substep_dt,
        max_joint_vel=cfg.max_joint_velocity,
        max_base_vel=cfg.max_base_velocity)
    if cfg.on_rack:
        # on-rack debug mode (minitaur.py:106, 418): the base is welded to
        # a rack — joints articulate, the trunk never moves.
        new_state = new_state.replace(
            base_pos=state.base_pos, base_quat=state.base_quat,
            base_lin_vel=jnp.zeros(3), base_ang_vel=jnp.zeros(3))

    push = lambda h, x: jnp.concatenate([x[None], h[:-1]], axis=0)
    return RobotState(
        state=new_state,
        q_hist=push(robot.q_hist, new_state.q),
        qd_hist=push(robot.qd_hist, new_state.qd),
        quat_hist=push(robot.quat_hist, new_state.base_quat),
        w_hist=push(robot.w_hist, new_state.base_ang_vel),
        last_action=robot.last_action, applied_torque=tau,
        contact=contact_state)


def control_step(robot: RobotState, action: jnp.ndarray,
                 params: DynamicsParams, cfg: SimConfig, h_fn,
                 control_mode: MotorControlMode = MotorControlMode.POSITION
                 ) -> RobotState:
    """One control step = `action_repeat` substeps with action interpolation
    (minitaur.Step:248-258 + ProcessAction lerp:1384-1401)."""
    if cfg.enable_clip_motor_commands and control_mode == MotorControlMode.POSITION:
        # a1._ClipMotorCommands:440-457: clamp change per control step.
        action = jnp.clip(
            action,
            robot.state.q - cfg.max_motor_angle_change,
            robot.state.q + cfg.max_motor_angle_change)

    prev_action = robot.last_action
    n = cfg.action_repeat
    hybrid = control_mode == MotorControlMode.HYBRID
    # HYBRID: interpolate only the position slot; gains/vel/ff are held
    # constant over the repeat window (same convention as the batched
    # path). last_action stays (12,) — the position target.
    q_des = action.reshape(12, 5)[:, 0] if hybrid else action

    def body(rb, i):
        if cfg.enable_action_interpolation and \
                control_mode != MotorControlMode.TORQUE:
            t = (i + 1.0) / n
            q_t = prev_action + t * (q_des - prev_action)
        else:
            q_t = q_des
        if hybrid:
            cmd = action.reshape(12, 5).at[:, 0].set(q_t).reshape(60)
        else:
            cmd = q_t
        rb = substep(rb, cmd, params, cfg, h_fn, control_mode)
        return rb, None

    robot, _ = jax.lax.scan(body, robot, jnp.arange(n))
    return robot.replace(last_action=q_des)
