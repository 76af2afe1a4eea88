"""Motor models: PD (Laikago/A1) and DC (Minitaur), as pure functions.

Reproduces the torque laws of the reference's motor models
(deployment/robots/laikago_motor.py:103-175 — POSITION / TORQUE / HYBRID
modes with strength ratios and torque limits; minitaur_motor.py:40-191 —
DC motor with voltage clipping, back-EMF and viscous damping) without the
Python-object plumbing: each is a vmappable function of (command, observed
state, gains).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class MotorControlMode(enum.IntEnum):
    """Mirrors rlschool robot_config.MotorControlMode."""

    POSITION = 0
    TORQUE = 1
    HYBRID = 2
    PWM = 3


# Hybrid command layout (laikago_motor.py:33-37): per motor 5-tuple
# (position, position_gain, velocity, velocity_gain, torque).
HYBRID_DIM = 5


def pd_torque(motor_commands: jnp.ndarray,
              motor_angle: jnp.ndarray,
              motor_velocity: jnp.ndarray,
              kp: jnp.ndarray,
              kd: jnp.ndarray,
              torque_limits: jnp.ndarray | None = None,
              strength_ratios: jnp.ndarray | float = 1.0) -> jnp.ndarray:
    """POSITION-mode PD torque: τ = −kp (q − q*) − kd q̇  (laikago_motor.py:165-175).

    `motor_angle`/`motor_velocity` should already be the latency-delayed
    observations, matching the reference's use of delayed state for PD.
    """
    tau = -kp * (motor_angle - motor_commands) - kd * motor_velocity
    tau = strength_ratios * tau
    if torque_limits is not None:
        tau = jnp.clip(tau, -torque_limits, torque_limits)
    return tau


def hybrid_torque(motor_commands: jnp.ndarray,
                  motor_angle: jnp.ndarray,
                  motor_velocity: jnp.ndarray,
                  torque_limits: jnp.ndarray | None = None,
                  strength_ratios: jnp.ndarray | float = 1.0) -> jnp.ndarray:
    """HYBRID-mode torque from a (..., 60) command vector (laikago_motor.py:152-166)."""
    cmd = motor_commands.reshape(motor_commands.shape[:-1] + (-1, HYBRID_DIM))
    q_des, kp, qd_des, kd, tau_ff = (
        cmd[..., 0], cmd[..., 1], cmd[..., 2], cmd[..., 3], cmd[..., 4])
    tau = -kp * (motor_angle - q_des) - kd * (motor_velocity - qd_des) + tau_ff
    tau = strength_ratios * tau
    if torque_limits is not None:
        tau = jnp.clip(tau, -torque_limits, torque_limits)
    return tau


def torque_passthrough(motor_commands: jnp.ndarray,
                       torque_limits: jnp.ndarray | None = None,
                       strength_ratios: jnp.ndarray | float = 1.0) -> jnp.ndarray:
    """TORQUE mode (laikago_motor.py:136-139)."""
    tau = strength_ratios * motor_commands
    if torque_limits is not None:
        tau = jnp.clip(tau, -torque_limits, torque_limits)
    return tau


def dc_motor_torque(pwm: jnp.ndarray,
                    true_motor_velocity: jnp.ndarray,
                    voltage: float = 16.0,
                    resistance: float = 0.186,
                    torque_constant: float = 0.0954,
                    viscous_damping: float = 0.0,
                    current_limit: float = 57.0) -> jnp.ndarray:
    """Minitaur DC motor torque from PWM (minitaur_motor.py:27-64 semantics):
    voltage clip → back-EMF → current → torque, with viscous damping."""
    observed_voltage = jnp.clip(pwm * voltage, -voltage, voltage)
    back_emf = (torque_constant + viscous_damping) * true_motor_velocity
    current = (observed_voltage - back_emf) / resistance
    current = jnp.clip(current, -current_limit, current_limit)
    return current * torque_constant
