"""ETG readout → per-leg foot deltas → joint-space residual gait.

Rebuild of rlschool's ``ETG_model`` [inferred: consumed via
``env.reset(ETG_w, ETG_b)`` (train.py:131) and surfaced as 12 joint-angle
deltas in ``info["ETG_act"]`` (env_test.py:54, replayed on hardware at
deployment/test.py:95-96 as ``action = policy·bound + ETG_act``)].

Mechanics:
- readout delta(t) = w · V(t) + b gives a foot-position offset (x, 0, z)
  in the hip frame (w row 1 is zero by construction, train.py:108).
- the trot pairing mirrors diagonal legs with a half-period phase shift:
  legs (FR, RL) follow V(t), legs (FL, RR) follow V(t + T/2).
- a constant lateral offset ±step_y (train.py --step_y) pushes feet
  outward.
- joint deltas = IK(default_foot + delta) − default_pose, exactly the
  residual added to policy actions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from paddlerobotics_tpu.core.config import ETGConfig
from paddlerobotics_tpu.etg import oscillator
from paddlerobotics_tpu.sim import a1_model as a1

# Diagonal trot pairing: FR(0) & RL(3) in phase, FL(1) & RR(2) half-period.
LEG_PHASE_GROUP = np.array([0, 1, 1, 0])
# Available pairings of the 2-phase cycle (leg order FR FL RR RL):
# trot mirrors diagonals; bound mirrors front vs rear pairs — the
# 2-phase gallop-family gait the `gallop` task mode trains.
PAIRINGS = {"trot": LEG_PHASE_GROUP, "bound": np.array([0, 0, 1, 1])}


def leg_phase_group(pairing: str) -> np.ndarray:
    """(4,) phase-group indices for a pairing name ('auto' = trot)."""
    if pairing == "auto":
        pairing = "trot"
    try:
        return PAIRINGS[pairing]
    except KeyError:
        raise ValueError(f"unknown ETG pairing {pairing!r}; choose from "
                         f"{('auto', *PAIRINGS)}") from None


def resolve_pairing(etg_cfg: ETGConfig, task_mode: str) -> ETGConfig:
    """Resolve pairing='auto' against the task: the gallop flat task
    trains the bound gait, every other task the reference trot."""
    if etg_cfg.pairing != "auto":
        leg_phase_group(etg_cfg.pairing)   # validate eagerly
        return etg_cfg
    import dataclasses
    return dataclasses.replace(
        etg_cfg, pairing="bound" if task_mode == "gallop" else "trot")
# Lateral offset sign: right legs (FR, RR) outward is −y, left legs +y.
LATERAL_SIGN = np.array([-1.0, 1.0, -1.0, 1.0])

# Per-leg stance-foot offsets of rlschool's ETG_model relative to
# FK(INIT_MOTOR_ANGLES), recovered numerically from the shipped golden gait
# `gait_action_list_ETG_exp.npy` (produced by env_test.py:51-58 at
# step_y=0.05): running our FK over the golden joint angles shows every
# leg's foot-y is *exactly* constant (std 0 over 600 steps) at the values
# below, rear-leg x is offset from front by exactly +0.006 m, and z offsets
# are zero. The y column is parameterized as  measured + sign·(step_y−0.05)
# so the --step_y flag keeps its meaning around the recovered operating
# point. tests/test_etg.py::test_golden_gait_rmse pins this end to end.
STANCE_OFFSET_X = np.array([0.0, 0.0, 0.006, 0.006])     # FR FL RR RL
STANCE_OFFSET_Y = np.array([-0.015764, 0.018136, -0.005764, 0.005136])
REFERENCE_STEP_Y = 0.05


def default_foot_positions() -> np.ndarray:
    """Foot positions in base frame at the default standing pose, (4,3).

    Pure numpy (mirrors a1.foot_position_in_hip_frame) so it can be
    computed at import time without entering a JAX trace.
    """
    q = a1.INIT_MOTOR_ANGLES.reshape(4, 3)
    out = np.zeros((4, 3))
    for i in range(4):
        t_ab, t_hip, t_knee = q[i]
        l_hip = a1.L_HIP * a1.HIP_SIGNS[i]
        leg = np.sqrt(a1.L_UP**2 + a1.L_LOW**2 +
                      2 * a1.L_UP * a1.L_LOW * np.cos(t_knee))
        eff = t_hip + t_knee / 2
        off_x = -leg * np.sin(eff)
        off_z_hip = -leg * np.cos(eff)
        off_y = np.cos(t_ab) * l_hip - np.sin(t_ab) * off_z_hip
        off_z = np.sin(t_ab) * l_hip + np.cos(t_ab) * off_z_hip
        out[i] = [off_x, off_y, off_z]
    return out + a1.HIP_OFFSETS


_DEFAULT_FEET = default_foot_positions()


def _feet() -> np.ndarray:
    return _DEFAULT_FEET


def foot_deltas(w: jnp.ndarray, b: jnp.ndarray,
                v_a: jnp.ndarray, v_b: jnp.ndarray,
                cfg: ETGConfig) -> jnp.ndarray:
    """Per-leg (4,3) foot-position deltas from readout and the two phase
    features V(t) and V(t+T/2)."""
    d_a = w @ v_a + b          # (3,) for phase group 0
    d_b = w @ v_b + b          # (3,) for phase group 1
    group = jnp.asarray(leg_phase_group(cfg.pairing))
    d = jnp.where(group[:, None] == 0, d_a[None, :], d_b[None, :])
    lateral = jnp.asarray(STANCE_OFFSET_Y) + \
        (cfg.step_y - REFERENCE_STEP_Y) * jnp.asarray(LATERAL_SIGN)
    d = d.at[:, 0].add(jnp.asarray(STANCE_OFFSET_X))
    return d.at[:, 1].add(lateral)


def etg_joint_residual(w: jnp.ndarray, b: jnp.ndarray,
                       v_a: jnp.ndarray, v_b: jnp.ndarray,
                       cfg: ETGConfig) -> jnp.ndarray:
    """12-dim joint-space gait residual, i.e. the reference's ETG_act."""
    feet = jnp.asarray(_feet()) + foot_deltas(w, b, v_a, v_b, cfg)
    q = a1.joint_angles_from_foot_positions(feet)
    return q - jnp.asarray(a1.INIT_MOTOR_ANGLES)


def phase_tables(cfg: ETGConfig, n_steps: int):
    """Precompute (V(t_k), V(t_k+T/2)) tables for an episode, (n,H) each."""
    ts = jnp.arange(n_steps) * cfg.dt
    v_a = oscillator.update(ts, cfg)
    v_b = oscillator.update(ts + cfg.T / 2.0, cfg)
    return v_a, v_b


def gait_table(w: jnp.ndarray, b: jnp.ndarray, cfg: ETGConfig,
               n_steps: int) -> jnp.ndarray:
    """Precomputed (n_steps, 12) ETG_act table — the TPU equivalent of
    env_test.py's exported gait_action_list npy used for deployment replay."""
    v_a, v_b = phase_tables(cfg, n_steps)
    import jax

    return jax.vmap(lambda va, vb: etg_joint_residual(w, b, va, vb, cfg))(
        v_a, v_b)
