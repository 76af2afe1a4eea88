"""Soft (penalty/regularized-Coulomb) contact model.

Replaces PyBullet's LCP contact solver with a branch-free spring-damper
normal force + smooth Coulomb friction, evaluated at the 4 foot spheres,
the 4 knee points, and the trunk underside. This is the standard
massively-parallel-sim contact formulation (Isaac-Gym/Brax style): fully
vectorized, stable under vmap, no data-dependent control flow.

Contact *flags* feed the reference's FootContactSensor observation
(deployment/envs/EnvWrapper.py:94-96) and the badfoot/footcontact reward
channels (train.py Param_Dict).
"""

from __future__ import annotations

import jax.numpy as jnp

from paddlerobotics_tpu.core.config import SimConfig
from paddlerobotics_tpu.core.types import ContactState, QuadState
from paddlerobotics_tpu.sim import a1_model as a1
from paddlerobotics_tpu.sim import dynamics, terrain
from paddlerobotics_tpu.sim.dynamics import DynamicsParams


def _point_forces(pos, vel, h_fn, radius, k, d, mu, vs, cap=None):
    """Penalty contact force for sphere-tip points.

    Args:
      pos: (...,3) world point centers; vel: (...,3) world velocities.
      radius: sphere radius (lowest point = z − radius).
    Returns: (force (...,3), penetration (...,), normal (...,3)).
    """
    x, y, z = pos[..., 0], pos[..., 1], pos[..., 2]
    h, n = terrain.height_and_normal(h_fn, x, y)
    phi = h - (z - radius)                      # >0 ⇒ penetrating
    in_contact = phi > 0.0
    # stair-edge regularization (see sbatch._point_contact): project the
    # vertical gap onto the surface normal and cap it, so riser grazes
    # give bounded forces
    phi_c = jnp.minimum(jnp.maximum(phi, 0.0) * n[..., 2], 0.04)

    vn = jnp.sum(vel * n, axis=-1)
    f_n_mag = jnp.maximum(k * phi_c - d * vn * (phi_c > 0), 0.0)
    f_n = f_n_mag[..., None] * n

    vt = vel - vn[..., None] * n
    vt_norm = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + vs * vs)
    coef = mu * f_n_mag / vt_norm
    if cap is not None:
        # tangential impulse cap — see sbatch._point_contact: keeps the
        # near-zero-slip stiction slope below the explicit substep's
        # stability limit (friction arrests the point, never reverses it)
        coef = jnp.minimum(coef, cap)
    f_t = -coef[..., None] * vt

    return f_n + f_t, phi, in_contact


def compute_contacts(state: QuadState, poses, h_fn,
                     params: DynamicsParams, cfg: SimConfig):
    """All contact forces + ContactState for one env.

    Returns (contact_state, foot_forces_w (4,3), knee_forces_w (4,3),
    base_force_w (3,)).
    """
    k = cfg.contact_stiffness
    d = cfg.contact_damping
    mu = cfg.friction_coef * params.foot_friction
    vs = cfg.friction_vel_scale

    idt = 1.0 / cfg.substep_dt
    foot_pos = poses["o_foot"]
    foot_vel = dynamics.foot_world_velocities(state, poses)
    foot_f, foot_phi, foot_contact = _point_forces(
        foot_pos, foot_vel, h_fn, a1.FOOT_RADIUS, k, d, mu, vs,
        cap=cfg.friction_cap_mass_foot * idt)

    # Knee (calf origin) contact: normal penalty only, lower stiffness.
    # Approximates knee-link collisions that PyBullet reports as
    # "bad foot" contacts (rlschool badfoot reward channel).
    knee_pos = poses["o_calf"]
    R_b = poses["R_base"]
    w_w = R_b @ state.base_ang_vel
    v_w = R_b @ state.base_lin_vel
    knee_vel = v_w + jnp.cross(w_w, knee_pos - state.base_pos)
    knee_f, knee_phi, _ = _point_forces(
        knee_pos, knee_vel, h_fn, 0.02, 0.5 * k, 0.5 * d, mu, vs,
        cap=cfg.friction_cap_mass_knee * idt)

    # Trunk underside contact (single point under the base origin).
    base_low = state.base_pos - jnp.array([0.0, 0.0, dynamics.TRUNK_HALF_HEIGHT])
    base_f, base_phi, _ = _point_forces(
        base_low[None, :], v_w[None, :], h_fn, 0.0, k, d, mu, vs,
        cap=cfg.friction_cap_mass_base * idt)
    base_f = base_f[0]
    base_phi = base_phi[0]

    contact_state = ContactState(
        foot_pos=foot_pos,
        foot_vel=foot_vel,
        forces=foot_f,
        penetration=foot_phi,
        in_contact=foot_contact,
        knee_penetration=knee_phi,
        base_penetration=base_phi,
    )
    return contact_state, foot_f, knee_f, base_f
