"""On-robot state estimation: velocity Kalman filter + moving-window mean.

Rebuild of deployment/robots/a1_robot_velocity_estimator.py (scalar-gain
KF fusing accelerometer integration with contact-leg FK velocity, plus a
120-sample moving window) and moving_window_filter.py (Neumaier
compensated-sum windowed mean), as functional JAX with NamedTuple state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from paddlerobotics_tpu.sim import a1_model as a1


class MovingWindowState(NamedTuple):
    """Fixed-size window mean with Neumaier-compensated running sum."""

    window: jnp.ndarray   # (W, d)
    idx: jnp.ndarray      # ()
    total: jnp.ndarray    # (d,) running sum
    comp: jnp.ndarray     # (d,) compensation term


def window_init(size: int, dim: int) -> MovingWindowState:
    return MovingWindowState(
        window=jnp.zeros((size, dim)), idx=jnp.zeros((), jnp.int32),
        total=jnp.zeros(dim), comp=jnp.zeros(dim))


def window_update(s: MovingWindowState, value: jnp.ndarray):
    """Push a value; returns (mean, new_state)."""
    W = s.window.shape[0]
    old = s.window[s.idx % W]
    # Neumaier update of total += value − old
    delta = value - old
    t = s.total + delta
    comp = s.comp + jnp.where(jnp.abs(s.total) >= jnp.abs(delta),
                              (s.total - t) + delta,
                              (delta - t) + s.total)
    window = s.window.at[s.idx % W].set(value)
    n = jnp.minimum(s.idx + 1, W).astype(jnp.float32)
    mean = (t + comp) / n
    return mean, MovingWindowState(window, s.idx + 1, t, comp)


class VelocityEstimatorState(NamedTuple):
    estimate: jnp.ndarray         # (3,) filtered base velocity (world)
    variance: jnp.ndarray         # () scalar covariance
    window: MovingWindowState


def estimator_init(window_size: int = 120) -> VelocityEstimatorState:
    return VelocityEstimatorState(
        estimate=jnp.zeros(3), variance=jnp.asarray(0.1),
        window=window_init(window_size, 3))


def estimator_update(s: VelocityEstimatorState,
                     accel_world: jnp.ndarray,
                     motor_q: jnp.ndarray, motor_qd: jnp.ndarray,
                     foot_contacts: jnp.ndarray,
                     dt: float,
                     accel_var: float = 0.1,
                     obs_var: float = 0.1):
    """One KF step (a1_robot_velocity_estimator.py:13-60 semantics).

    Predict by integrating the (gravity-compensated) world acceleration;
    observe the negated stance-foot velocity from leg kinematics; fuse
    with scalar Kalman gain; smooth with the moving window.
    """
    # predict
    pred = s.estimate + accel_world * dt
    var = s.variance + accel_var * dt

    # observe: v_base ≈ −J(q)·q̇ for legs in contact (base frame ≈ world
    # for small tilt; the reference rotates by base orientation)
    q = motor_q.reshape(4, 3)
    qd = motor_qd.reshape(4, 3)
    J = a1.analytical_leg_jacobian(q, jnp.asarray(a1.HIP_SIGNS))
    foot_vel = (J @ qd[..., None])[..., 0]            # (4,3)
    contact_f = foot_contacts.astype(jnp.float32)
    n_contact = jnp.sum(contact_f)
    obs = -jnp.sum(foot_vel * contact_f[:, None], axis=0) / \
        jnp.maximum(n_contact, 1.0)
    have_obs = n_contact > 0

    gain = var / (var + obs_var)
    fused = jnp.where(have_obs, pred + gain * (obs - pred), pred)
    var = jnp.where(have_obs, (1.0 - gain) * var, var)

    mean, win = window_update(s.window, fused)
    return mean, VelocityEstimatorState(fused, var, win)
