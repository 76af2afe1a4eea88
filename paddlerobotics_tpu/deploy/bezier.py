"""Open-loop Bezier gait generator, functional JAX.

Rebuild of deployment/utilities/Bezier.py (BezierGait: 12-control-point
Bernstein swing + sinusoidal stance from the MIT Cheetah gait work,
per-leg phase lags with a touchdown-reset stride clock, yaw-circle
correction) and SpotOL.py (BezierStepper: ramping state machine for
StepLength / StepVelocity / YawRate). The mutable Python clock state
becomes a `BezierState` NamedTuple so the generator vmaps and scans.

Leg order here follows the gait generator's convention FL, FR, BL, BR
with default phase lags (0, 0, 0.5, 0.5) — a trot.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

NUM_CTRL = 11  # Bezier degree (12 points)

# Swing control-point templates (scaled by step length L and clearance):
# forward component ×L, vertical ×clearance (Bezier.py:224-266 constants,
# which themselves come from the published MIT Cheetah trajectory).
_STEP_X = np.array([-1.0, -1.4, -1.5, -1.5, -1.5, 0.0, 0.0, 0.0,
                    1.5, 1.5, 1.4, 1.0])
_STEP_Z = np.array([0.0, 0.0, 0.9, 0.9, 0.9, 0.9, 0.9, 1.1, 1.1, 1.1,
                    0.0, 0.0])
_BINOM = np.array([math.comb(NUM_CTRL, k) for k in range(NUM_CTRL + 1)])

DEFAULT_PHASE_LAGS = np.array([0.0, 0.5, 0.5, 0.0])  # FL, FR, BL, BR trot


class BezierState(NamedTuple):
    time: jnp.ndarray                # ()
    td_time: jnp.ndarray             # () last reference-leg touchdown
    sw_ref: jnp.ndarray              # () reference-leg swing phase
    prev_foot: jnp.ndarray           # (4,3) previous foot targets


def init_state() -> BezierState:
    return BezierState(
        time=jnp.zeros(()), td_time=jnp.zeros(()),
        sw_ref=jnp.zeros(()), prev_foot=jnp.zeros((4, 3)))


def bernstein_sum(phase: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Σ_k points[k]·C(n,k)·φᵏ(1−φ)ⁿ⁻ᵏ, batched over trailing dims."""
    k = jnp.arange(NUM_CTRL + 1)
    basis = jnp.asarray(_BINOM) * phase[..., None] ** k * \
        (1.0 - phase[..., None]) ** (NUM_CTRL - k)
    return jnp.sum(basis * points, axis=-1)


def bezier_swing(phase, L, lateral_fraction, clearance_height):
    """Swing-foot delta (x,y,z) (Bezier.py:211-279). L/lateral_fraction
    may be scalars or per-leg arrays broadcasting against `phase`."""
    xp, yp = jnp.cos(lateral_fraction), jnp.sin(lateral_fraction)
    pts = jnp.asarray(L)[..., None] * jnp.asarray(_STEP_X)
    step = bernstein_sum(phase, pts)
    zpts = jnp.asarray(clearance_height)[..., None] * jnp.asarray(_STEP_Z)
    z = bernstein_sum(phase, zpts)
    return step * xp, step * yp, z


def sine_stance(phase, L, lateral_fraction, penetration_depth):
    """Stance-foot delta: linear drag-back + cosine penetration
    (Bezier.py:281-305)."""
    xp, yp = jnp.cos(lateral_fraction), jnp.sin(lateral_fraction)
    step = L * (1.0 - 2.0 * phase)
    sx, sy = step * xp, step * yp
    z = jnp.where(jnp.abs(L) > 1e-8,
                  -penetration_depth * jnp.cos(
                      (jnp.pi * (sx + sy)) / (2.0 * L + 1e-12)),
                  0.0)
    return sx, sy, z


def leg_phase(t_since_td, lag, t_stance, t_swing):
    """Per-leg (phase, is_swing) from the shared stride clock
    (Bezier.py:77-134 logic, branch-free)."""
    t_stride = t_stance + t_swing
    ti = t_since_td - lag * t_stride
    ti = jnp.where(ti < -t_swing, ti + t_stride, ti)
    in_stance = (ti >= 0.0) & (ti <= t_stance)
    stance_phase = jnp.where(t_stance > 0, ti / jnp.maximum(t_stance, 1e-8),
                             0.0)
    swing_phase = jnp.where(ti < 0.0, (ti + t_swing) / t_swing,
                            (ti - t_stance) / t_swing)
    swing_phase = jnp.clip(swing_phase, 0.0, 1.0)
    phase = jnp.where(in_stance, jnp.clip(stance_phase, 0.0, 1.0),
                      swing_phase)
    return phase, ~in_stance


def generate_trajectory(state: BezierState,
                        default_feet: jnp.ndarray,
                        step_length, lateral_fraction, yaw_rate,
                        step_velocity, clearance_height=0.05,
                        penetration_depth=0.01, dt: float = 0.01,
                        t_swing: float = 0.2,
                        phase_lags=DEFAULT_PHASE_LAGS
                        ) -> Tuple[jnp.ndarray, BezierState]:
    """One gait tick → foot targets (4,3) in base frame + next state.

    Functional equivalent of BezierGait.GenerateTrajectoryX
    (Bezier.py:530-612): computes per-leg linear swing/stance deltas plus
    the yaw-circle rotational component, applied about each default foot.
    """
    L = step_length / 2.0
    t_stance = jnp.where(jnp.abs(step_velocity) > 1e-3,
                         2.0 * jnp.abs(L) / jnp.maximum(
                             jnp.abs(step_velocity), 1e-3),
                         0.0)
    t_stance = jnp.clip(t_stance, 0.0, 1.25 * t_swing)
    t_stride = t_stance + t_swing

    # stride clock with touchdown reset on the reference leg
    t_since = jnp.clip(state.time - state.td_time, 0.0, t_stride)
    phases, is_swing = leg_phase(t_since, jnp.asarray(phase_lags),
                                 t_stance, t_swing)       # (4,), (4,)

    # linear component
    lx_sw, ly_sw, lz_sw = bezier_swing(phases, L, lateral_fraction,
                                       clearance_height)
    lx_st, ly_st, lz_st = sine_stance(phases, L, lateral_fraction,
                                      penetration_depth)
    lx = jnp.where(is_swing, lx_sw, lx_st)
    ly = jnp.where(is_swing, ly_sw, ly_st)
    lz = jnp.where(is_swing, lz_sw, lz_st)

    # yaw-circle rotational component (Bezier.py:306-395): each foot
    # traces a tangent to the circle about the body center.
    fx, fy = default_feet[:, 0], default_feet[:, 1]
    mag = jnp.sqrt(fx ** 2 + fy ** 2)
    direction = jnp.arctan2(fy, fx)
    g = state.prev_foot - default_feet
    g_mag = jnp.sqrt(g[:, 0] ** 2 + g[:, 1] ** 2)
    th_mod = jnp.arctan2(g_mag, mag)
    # FR(1)/BL(2) get +direction, FL(0)/BR(3) −direction
    sign = jnp.asarray([-1.0, 1.0, 1.0, -1.0])
    phi_arc = jnp.pi / 2.0 + sign * direction + th_mod
    yaw_L = yaw_rate * mag / 2.0
    rx_sw, ry_sw, rz_sw = bezier_swing(phases, yaw_L, phi_arc,
                                       clearance_height)
    rx_st, ry_st, rz_st = sine_stance(phases, yaw_L, phi_arc,
                                      penetration_depth)
    rx = jnp.where(is_swing, rx_sw, rx_st)
    ry = jnp.where(is_swing, ry_sw, ry_st)
    rz = jnp.where(is_swing, rz_sw, rz_st)

    feet = default_feet + jnp.stack([lx + rx, ly + ry, lz + rz], axis=-1)

    # clock update: reference leg (0) touchdown resets the stride clock
    ref_phase = phases[0]
    ref_swing = is_swing[0]
    td = ref_swing & (ref_phase >= 0.999)
    new_td_time = jnp.where(td, state.time, state.td_time)
    new_state = BezierState(
        time=state.time + dt, td_time=new_td_time,
        sw_ref=jnp.where(ref_swing, ref_phase, state.sw_ref),
        prev_foot=feet)
    return feet, new_state


class StepperState(NamedTuple):
    """Ramping command state (SpotOL.py BezierStepper:23-258)."""

    step_length: jnp.ndarray
    step_velocity: jnp.ndarray
    yaw_rate: jnp.ndarray
    lateral_fraction: jnp.ndarray


STEP_LENGTH_LIMITS = (-0.05, 0.05)
STEP_VELOCITY_LIMITS = (0.001, 3.0)
YAW_RATE_LIMITS = (-2.0, 2.0)
LATERAL_FRACTION_LIMITS = (-np.pi / 2.0, np.pi / 2.0)


def stepper_init() -> StepperState:
    return StepperState(jnp.zeros(()), jnp.asarray(0.001), jnp.zeros(()),
                        jnp.zeros(()))


def stepper_ramp(state: StepperState, target_length, target_velocity,
                 target_yaw=0.0, target_lateral=0.0,
                 ramp: float = 0.05) -> StepperState:
    """Ramp commands toward targets with rate limits (the FSM's
    move-toward behavior, SpotOL.py:150-258), then clip to limits."""
    def toward(cur, tgt):
        return cur + jnp.clip(tgt - cur, -ramp, ramp)

    return StepperState(
        step_length=jnp.clip(toward(state.step_length, target_length),
                             *STEP_LENGTH_LIMITS),
        step_velocity=jnp.clip(toward(state.step_velocity, target_velocity),
                               *STEP_VELOCITY_LIMITS),
        yaw_rate=jnp.clip(toward(state.yaw_rate, target_yaw),
                          *YAW_RATE_LIMITS),
        lateral_fraction=jnp.clip(toward(state.lateral_fraction,
                                         target_lateral),
                                  *LATERAL_FRACTION_LIMITS))
