"""PyTree state containers (flax.struct dataclasses).

These replace the reference's mutable Python object state (PyBullet handles,
deques, counters spread over Minitaur/env-wrapper instances —
QuadrupedalRobots/ETGRL/deployment/robots/minitaur.py:86-1435) with
fixed-shape, vmappable functional state.
"""

from __future__ import annotations

from flax import struct
import jax.numpy as jnp


@struct.dataclass
class QuadState:
    """Dynamic state of one A1 robot (18 DoF).

    Velocities are stored as the base-frame spatial velocity of the trunk
    (angular first) plus joint rates, i.e. Featherstone generalized
    velocity. All quantities are float32 unless noted.
    """

    base_pos: jnp.ndarray      # (3,) world position of trunk frame origin
    base_quat: jnp.ndarray     # (4,) wxyz, trunk→world rotation
    base_ang_vel: jnp.ndarray  # (3,) trunk angular velocity, trunk frame
    base_lin_vel: jnp.ndarray  # (3,) trunk-origin linear velocity, trunk frame
    q: jnp.ndarray             # (12,) joint angles
    qd: jnp.ndarray            # (12,) joint velocities


@struct.dataclass
class ContactState:
    """Per-foot contact info from the soft-contact solver."""

    foot_pos: jnp.ndarray      # (4,3) world foot-sphere centers
    foot_vel: jnp.ndarray      # (4,3) world foot-center velocities
    forces: jnp.ndarray        # (4,3) world contact forces on each foot
    penetration: jnp.ndarray   # (4,) signed penetration depth (>0 in contact)
    in_contact: jnp.ndarray    # (4,) bool
    knee_penetration: jnp.ndarray  # (4,) knee/calf illegal-contact depth
    base_penetration: jnp.ndarray  # () trunk-ground penetration depth


@struct.dataclass
class RobotState:
    """QuadState plus the bookkeeping the reference keeps in Python objects:
    latency ring buffer (minitaur.py:1151-1193), last applied action/torque,
    and filter state."""

    state: QuadState
    # Ring buffers of substep snapshots for observation latency, newest at
    # index 0 (minitaur._observation_history holds q, qd, quat and
    # rpy-rate together; split into typed leaves here). Shapes (L,12),
    # (L,12), (L,4), (L,3).
    q_hist: jnp.ndarray
    qd_hist: jnp.ndarray
    quat_hist: jnp.ndarray
    w_hist: jnp.ndarray
    last_action: jnp.ndarray        # (12,) last motor command
    applied_torque: jnp.ndarray     # (12,) torques applied at last substep
    contact: ContactState
