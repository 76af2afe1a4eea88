"""Featherstone articulated-body dynamics (ABA) for the A1, in pure JAX.

This replaces PyBullet's C++ multibody engine (the `stepSimulation` call at
QuadrupedalRobots/ETGRL/deployment/robots/minitaur.py:244) with an O(n)
forward-dynamics pass written for TPU execution:

- The tree (floating trunk + 4 identical 3-DoF legs) is specialized: the
  three-link leg chains are *vmapped over the leg axis*, so one env's
  dynamics is a handful of (4,6,6) batched matmuls, and `vmap` over envs
  turns them into (B,4,6,6) element-wise/TPU-friendly contractions.
- All shapes are static; the whole step jits into a single XLA program.

Spatial-vector conventions follow Featherstone's RBDA: motion vectors are
[ω; v] (angular first), force vectors [n; f]; a coordinate transform from
frame A to frame B located at r (A coords) with rotation E = B_R_A maps
motion as [Eω; E(v − r×ω)].

Randomizable physical parameters enter through `DynamicsParams`
(a PyTree, so they can differ per env under vmap), mirroring the
reference's param2dynamic_dict ranges (ETGRL/train.py:112-126).
"""

from __future__ import annotations

from flax import struct
import jax
import jax.numpy as jnp
import numpy as np

from paddlerobotics_tpu.core import math3d
from paddlerobotics_tpu.core.types import QuadState
from paddlerobotics_tpu.sim import a1_model as a1


# --- randomizable dynamics parameters ---------------------------------------

@struct.dataclass
class DynamicsParams:
    """Per-env physical parameters (PyTree; vmappable).

    Mirrors the reference's dynamic_param dict (train.py:112-126):
    control_latency / footfriction / basemass / baseinertia / legmass /
    leginertia / motor_kp / motor_kd / gravity (+ random external force).
    """

    base_mass_scale: jnp.ndarray      # () scale on trunk mass
    base_inertia_scale: jnp.ndarray   # (3,) scale on trunk inertia diagonal
    leg_mass_scale: jnp.ndarray       # (3,) scale per link type [hip,thigh,calf]
    leg_inertia_scale: jnp.ndarray    # (4,3) scale per leg × link type
    motor_kp: jnp.ndarray             # (12,)
    motor_kd: jnp.ndarray             # (12,)
    foot_friction: jnp.ndarray        # () friction coefficient multiplier
    control_latency: jnp.ndarray      # () seconds of observation latency
    gravity: jnp.ndarray              # (3,) world gravity vector
    external_force: jnp.ndarray       # (3,) world push force on the trunk

    @staticmethod
    def default() -> "DynamicsParams":
        return DynamicsParams(
            base_mass_scale=jnp.asarray(1.0),
            base_inertia_scale=jnp.ones(3),
            leg_mass_scale=jnp.ones(3),
            leg_inertia_scale=jnp.ones((4, 3)),
            motor_kp=jnp.asarray(a1.MOTOR_KP),
            motor_kd=jnp.asarray(a1.MOTOR_KD),
            foot_friction=jnp.asarray(1.0),
            control_latency=jnp.asarray(0.002),
            gravity=jnp.asarray([0.0, 0.0, -9.8]),
            external_force=jnp.zeros(3),
        )


# --- constant link data (numpy, computed at import) --------------------------

def _mirror_y(inertia: np.ndarray) -> np.ndarray:
    m = np.diag([1.0, -1.0, 1.0])
    return m @ inertia @ m


_CALF_MASS, _CALF_COM, _CALF_INERTIA = a1.combined_calf_inertia()

# Per-leg link constants; legs ordered FR, FL, RR, RL. Right legs (FR, RR)
# use the URDF right-side values; left legs mirror the y components.
_LEG_IS_LEFT = np.array([False, True, False, True])

HIP_COM = np.stack([
    a1.HIP_COM_R * np.array([1.0, -1.0, 1.0]) if left else a1.HIP_COM_R
    for left in _LEG_IS_LEFT])
HIP_INERTIA_L = np.stack([
    _mirror_y(a1.HIP_INERTIA) if left else a1.HIP_INERTIA for left in _LEG_IS_LEFT])
THIGH_COM = np.stack([
    a1.THIGH_COM_R * np.array([1.0, -1.0, 1.0]) if left else a1.THIGH_COM_R
    for left in _LEG_IS_LEFT])
THIGH_INERTIA_L = np.stack([
    _mirror_y(a1.THIGH_INERTIA) if left else a1.THIGH_INERTIA
    for left in _LEG_IS_LEFT])
CALF_COM = np.broadcast_to(_CALF_COM, (4, 3)).copy()
CALF_INERTIA_L = np.broadcast_to(_CALF_INERTIA, (4, 3, 3)).copy()

LINK_MASSES = np.array([a1.HIP_MASS, a1.THIGH_MASS, _CALF_MASS])

# Joint attachment translations.
HIP_POS_IN_TRUNK = a1.HIP_JOINT_IN_TRUNK.copy()           # (4,3)
THIGH_POS_IN_HIP = np.stack([
    np.array([0.0, a1.THIGH_JOINT_IN_HIP_Y if left else -a1.THIGH_JOINT_IN_HIP_Y, 0.0])
    for left in _LEG_IS_LEFT])                            # (4,3)
CALF_POS_IN_THIGH = np.broadcast_to(a1.CALF_JOINT_IN_THIGH, (4, 3)).copy()
FOOT_POS_IN_CALF = np.broadcast_to(a1.FOOT_OFFSET_IN_CALF, (4, 3)).copy()

# Joint motion subspaces: hip abduction about x, thigh/knee about y.
S_HIP = np.array([1.0, 0, 0, 0, 0, 0])
S_PITCH = np.array([0, 1.0, 0, 0, 0, 0])

TRUNK_HALF_HEIGHT = 0.057  # trunk collision box half height (a1.urdf: 0.114/2)


# --- spatial algebra helpers --------------------------------------------------

def spatial_inertia(mass, com, inertia_com):
    """6×6 spatial inertia about the body-frame origin.

    I = [[I_c + m ĉĉᵀ, m ĉ], [m ĉᵀ, m·1]] with ĉ = skew(com).
    Batched over leading dims.
    """
    c = math3d.skew(com)
    mcct = mass[..., None, None] * (c @ jnp.swapaxes(c, -1, -2))
    top = jnp.concatenate([inertia_com + mcct, mass[..., None, None] * c], axis=-1)
    eye = jnp.broadcast_to(jnp.eye(3), c.shape)
    bot = jnp.concatenate(
        [mass[..., None, None] * jnp.swapaxes(c, -1, -2),
         mass[..., None, None] * eye], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def xmat(E, r):
    """Motion-vector transform: frame A → frame B at position r (A coords)
    with rotation E = B_R_A. X = [[E, 0], [−E·skew(r), E]]."""
    z = jnp.zeros_like(E)
    top = jnp.concatenate([E, z], axis=-1)
    bot = jnp.concatenate([-E @ math3d.skew(r), E], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def crm(v):
    """Spatial cross product (motion): crm(v) = [[ω̂,0],[v̂,ω̂]]."""
    w = math3d.skew(v[..., :3])
    vx = math3d.skew(v[..., 3:])
    z = jnp.zeros_like(w)
    top = jnp.concatenate([w, z], axis=-1)
    bot = jnp.concatenate([vx, w], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def crf(v):
    """Spatial cross product (force): crf(v) = −crm(v)ᵀ = [[ω̂,v̂],[0,ω̂]]."""
    w = math3d.skew(v[..., :3])
    vx = math3d.skew(v[..., 3:])
    z = jnp.zeros_like(w)
    top = jnp.concatenate([w, vx], axis=-1)
    bot = jnp.concatenate([z, w], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def ext_spatial_force(R_body, origin, point_w, force_w):
    """World force at a world point → body-frame spatial force [n; f]."""
    f_local = R_body.swapaxes(-1, -2) @ force_w[..., None]
    f_local = f_local[..., 0]
    arm_w = point_w - origin
    n_w = jnp.cross(arm_w, force_w)
    n_local = (R_body.swapaxes(-1, -2) @ n_w[..., None])[..., 0]
    return jnp.concatenate([n_local, f_local], axis=-1)


# --- forward kinematics for the whole tree -----------------------------------

def world_poses(state: QuadState):
    """World rotations/origins of all bodies + foot centers.

    Returns dict with R_base (3,3), and per-leg (4,3,3)/(4,3) arrays for
    hip/thigh/calf plus foot world positions & velocities.
    """
    R_b = math3d.quat_to_mat(state.base_quat)
    q = state.q.reshape(4, 3)
    R_hip_local = math3d.rot_x(q[:, 0])             # (4,3,3)
    R_thigh_local = math3d.rot_y(q[:, 1])
    R_calf_local = math3d.rot_y(q[:, 2])

    R_h = R_b @ R_hip_local
    o_h = state.base_pos + (R_b @ jnp.asarray(HIP_POS_IN_TRUNK)[..., None])[..., 0]
    R_t = R_h @ R_thigh_local
    o_t = o_h + (R_h @ jnp.asarray(THIGH_POS_IN_HIP)[..., None])[..., 0]
    R_c = R_t @ R_calf_local
    o_c = o_t + (R_t @ jnp.asarray(CALF_POS_IN_THIGH)[..., None])[..., 0]
    o_f = o_c + (R_c @ jnp.asarray(FOOT_POS_IN_CALF)[..., None])[..., 0]
    return {
        "R_base": R_b,
        "R_hip": R_h, "o_hip": o_h,
        "R_thigh": R_t, "o_thigh": o_t,
        "R_calf": R_c, "o_calf": o_c,
        "o_foot": o_f,
    }


def foot_world_velocities(state: QuadState, poses) -> jnp.ndarray:
    """World-frame velocities of the 4 foot centers, (4,3).

    v_foot = R_b (v_b + ω_b × r_bf) + R_b J_leg q̇ where r_bf is the foot
    position in base frame — computed via per-body spatial velocities below
    for exactness.
    """
    R_b = poses["R_base"]
    w_w = R_b @ state.base_ang_vel          # world angular velocity of trunk
    v_w = R_b @ state.base_lin_vel          # world velocity of trunk origin
    # foot position relative to trunk origin (world)
    rel = poses["o_foot"] - state.base_pos  # (4,3)
    v_base_part = v_w + jnp.cross(w_w, rel)
    # joint contribution: J (base-frame) @ qd per leg, rotated to world
    q = state.q.reshape(4, 3)
    qd = state.qd.reshape(4, 3)
    J = a1.analytical_leg_jacobian(q, jnp.asarray(a1.HIP_SIGNS))  # (4,3,3) hip-frame
    v_hip_frame = (J @ qd[..., None])[..., 0]                     # (4,3)
    # hip frames are axis-aligned with the trunk at the hip joint (abduction
    # rotates inside J already — the analytic J maps to the *hip* frame which
    # is trunk-aligned), so rotate by R_b only.
    v_joint_world = (R_b @ v_hip_frame[..., None])[..., 0]
    return v_base_part + v_joint_world


# --- articulated-body algorithm ----------------------------------------------

def _build_leg_inertias(params: DynamicsParams):
    """Per-leg spatial inertias with randomization scales applied. (4,6,6)×3."""
    ms = params.leg_mass_scale
    # inertia scale per leg-link applied isotropically
    s_hip = params.leg_inertia_scale[:, 0][:, None, None]
    s_thigh = params.leg_inertia_scale[:, 1][:, None, None]
    s_calf = params.leg_inertia_scale[:, 2][:, None, None]
    m_hip = jnp.full((4,), LINK_MASSES[0] * ms[0])
    m_thigh = jnp.full((4,), LINK_MASSES[1] * ms[1])
    m_calf = jnp.full((4,), LINK_MASSES[2] * ms[2])
    I_hip = spatial_inertia(m_hip, jnp.asarray(HIP_COM),
                            jnp.asarray(HIP_INERTIA_L) * s_hip)
    I_thigh = spatial_inertia(m_thigh, jnp.asarray(THIGH_COM),
                              jnp.asarray(THIGH_INERTIA_L) * s_thigh)
    I_calf = spatial_inertia(m_calf, jnp.asarray(CALF_COM),
                             jnp.asarray(CALF_INERTIA_L) * s_calf)
    return (I_hip, I_thigh, I_calf), (m_hip, m_thigh, m_calf)


def forward_dynamics(state: QuadState,
                     torques: jnp.ndarray,
                     foot_forces_w: jnp.ndarray,
                     knee_forces_w: jnp.ndarray,
                     base_force_w: jnp.ndarray,
                     params: DynamicsParams,
                     poses=None):
    """ABA forward dynamics for one env.

    Args:
      state: current QuadState.
      torques: (12,) joint torques.
      foot_forces_w: (4,3) world contact forces at foot centers.
      knee_forces_w: (4,3) world contact forces at calf origins (knees).
      base_force_w: (3,) world force applied at the trunk origin
        (random pushes + trunk ground contact).
      params: DynamicsParams.
      poses: optional precomputed world_poses(state).

    Returns:
      (a0, qdd): base spatial acceleration (6,) in base coords and joint
      accelerations (12,).
    """
    if poses is None:
        poses = world_poses(state)
    tau = torques.reshape(4, 3)
    g = params.gravity

    # Trunk spatial inertia (scaled).
    m_trunk = a1.TRUNK_MASS * params.base_mass_scale
    I_trunk_c = jnp.asarray(a1.TRUNK_INERTIA) * params.base_inertia_scale[:, None]
    I0 = spatial_inertia(m_trunk, jnp.asarray(a1.TRUNK_COM), I_trunk_c)

    (I_hip, I_thigh, I_calf), (m_hip, m_thigh, m_calf) = _build_leg_inertias(params)

    # Joint transforms (parent→child motion transforms).
    q = state.q.reshape(4, 3)
    E1 = jnp.swapaxes(math3d.rot_x(q[:, 0]), -1, -2)   # trunk→hip
    E2 = jnp.swapaxes(math3d.rot_y(q[:, 1]), -1, -2)   # hip→thigh
    E3 = jnp.swapaxes(math3d.rot_y(q[:, 2]), -1, -2)   # thigh→calf
    X1 = xmat(E1, jnp.asarray(HIP_POS_IN_TRUNK))
    X2 = xmat(E2, jnp.asarray(THIGH_POS_IN_HIP))
    X3 = xmat(E3, jnp.asarray(CALF_POS_IN_THIGH))

    S1 = jnp.asarray(S_HIP)
    S2 = jnp.asarray(S_PITCH)
    qd = state.qd.reshape(4, 3)

    # Pass 1: velocities & velocity-product biases (legs batched on axis 0).
    v0 = jnp.concatenate([state.base_ang_vel, state.base_lin_vel])
    v1 = (X1 @ v0[None, :, None])[..., 0] + S1 * qd[:, 0:1]
    c1 = (crm(v1) @ (S1 * qd[:, 0:1])[..., None])[..., 0]
    v2 = (X2 @ v1[..., None])[..., 0] + S2 * qd[:, 1:2]
    c2 = (crm(v2) @ (S2 * qd[:, 1:2])[..., None])[..., 0]
    v3 = (X3 @ v2[..., None])[..., 0] + S2 * qd[:, 2:3]
    c3 = (crm(v3) @ (S2 * qd[:, 2:3])[..., None])[..., 0]

    # External forces per body (gravity + contacts), in body coords.
    def grav_force(R, origin, mass, com):
        f_w = mass[..., None] * g
        com_w = origin + (R @ com[..., None])[..., 0]
        return ext_spatial_force(R, origin, com_w, f_w)

    f1 = grav_force(poses["R_hip"], poses["o_hip"], m_hip, jnp.asarray(HIP_COM))
    f2 = grav_force(poses["R_thigh"], poses["o_thigh"], m_thigh,
                    jnp.asarray(THIGH_COM))
    f3 = grav_force(poses["R_calf"], poses["o_calf"], m_calf,
                    jnp.asarray(CALF_COM))
    # contact on foot (attached to calf) and knee (calf origin)
    f3 = f3 + ext_spatial_force(poses["R_calf"], poses["o_calf"],
                                poses["o_foot"], foot_forces_w)
    f3 = f3 + ext_spatial_force(poses["R_calf"], poses["o_calf"],
                                poses["o_calf"], knee_forces_w)

    R_b = poses["R_base"]
    f0 = grav_force(R_b, state.base_pos, m_trunk, jnp.asarray(a1.TRUNK_COM))
    f0 = f0 + ext_spatial_force(R_b, state.base_pos, state.base_pos,
                                base_force_w + params.external_force)

    # Pass 2: articulated inertias, inward (calf → hip → trunk).
    def eliminate(IA, pA, S, tau_j, c_bias):
        U = IA @ S                       # (...,6)
        d = jnp.sum(U * S, axis=-1)      # Sᵀ IA S, (...,)
        u = tau_j - jnp.sum(pA * S, axis=-1)
        Ia = IA - jnp.einsum('...i,...j->...ij', U, U) / d[..., None, None]
        pa = pA + (Ia @ c_bias[..., None])[..., 0] + U * (u / d)[..., None]
        return Ia, pa, U, d, u

    # calf
    pA3 = (crf(v3) @ (I_calf @ v3[..., None]))[..., 0] - f3
    Ia3, pa3, U3, d3, u3 = eliminate(I_calf, pA3, S2, tau[:, 2], c3)
    X3T = jnp.swapaxes(X3, -1, -2)
    IA2 = I_thigh + X3T @ Ia3 @ X3
    pA2 = (crf(v2) @ (I_thigh @ v2[..., None]))[..., 0] - f2 \
        + (X3T @ pa3[..., None])[..., 0]
    # thigh
    Ia2, pa2, U2, d2, u2 = eliminate(IA2, pA2, S2, tau[:, 1], c2)
    X2T = jnp.swapaxes(X2, -1, -2)
    IA1 = I_hip + X2T @ Ia2 @ X2
    pA1 = (crf(v1) @ (I_hip @ v1[..., None]))[..., 0] - f1 \
        + (X2T @ pa2[..., None])[..., 0]
    # hip
    Ia1, pa1, U1, d1, u1 = eliminate(IA1, pA1, S1, tau[:, 0], c1)
    X1T = jnp.swapaxes(X1, -1, -2)
    IA0 = I0 + jnp.sum(X1T @ Ia1 @ X1, axis=0)
    pA0 = (crf(v0) @ (I0 @ v0[..., None]))[..., 0]
    pA0 = pA0 - f0 + jnp.sum((X1T @ pa1[..., None])[..., 0], axis=0)

    # Base: a0 = −IA0⁻¹ pA0 (6×6 solve).
    a0 = jnp.linalg.solve(IA0, -pA0)

    # Pass 3: outward accelerations.
    a1_ = (X1 @ a0[None, :, None])[..., 0] + c1
    qdd1 = (u1 - (U1 * a1_).sum(-1)) / d1
    a1_ = a1_ + S1 * qdd1[..., None]
    a2_ = (X2 @ a1_[..., None])[..., 0] + c2
    qdd2 = (u2 - (U2 * a2_).sum(-1)) / d2
    a2_ = a2_ + S2 * qdd2[..., None]
    a3_ = (X3 @ a2_[..., None])[..., 0] + c3
    qdd3 = (u3 - (U3 * a3_).sum(-1)) / d3

    qdd = jnp.stack([qdd1, qdd2, qdd3], axis=-1).reshape(12)
    return a0, qdd


def integrate(state: QuadState, a0: jnp.ndarray, qdd: jnp.ndarray,
              dt: float, max_joint_vel: float = 100.0,
              max_base_vel: float = 50.0) -> QuadState:
    """Semi-implicit Euler: velocities first, then positions."""
    w_new = state.base_ang_vel + dt * a0[:3]
    v_new = state.base_lin_vel + dt * a0[3:]
    w_new = jnp.clip(w_new, -max_base_vel, max_base_vel)
    v_new = jnp.clip(v_new, -max_base_vel, max_base_vel)
    qd_new = jnp.clip(state.qd + dt * qdd, -max_joint_vel, max_joint_vel)

    R_b = math3d.quat_to_mat(state.base_quat)
    pos_new = state.base_pos + dt * (R_b @ v_new)
    quat_new = math3d.quat_integrate(state.base_quat, R_b @ w_new, dt)
    q_new = state.q + dt * qd_new
    return QuadState(
        base_pos=pos_new, base_quat=quat_new,
        base_ang_vel=w_new, base_lin_vel=v_new,
        q=q_new, qd=qd_new)


def default_state(height: float = 0.32,
                  motor_angles: np.ndarray | None = None) -> QuadState:
    """Initial standing state (a1.py INIT_POSITION / INIT_MOTOR_ANGLES)."""
    q0 = jnp.asarray(
        a1.INIT_MOTOR_ANGLES if motor_angles is None else motor_angles,
        dtype=jnp.float32)
    return QuadState(
        base_pos=jnp.array([0.0, 0.0, height], dtype=jnp.float32),
        base_quat=jnp.array([1.0, 0.0, 0.0, 0.0], dtype=jnp.float32),
        base_ang_vel=jnp.zeros(3, dtype=jnp.float32),
        base_lin_vel=jnp.zeros(3, dtype=jnp.float32),
        q=q0,
        qd=jnp.zeros(12, dtype=jnp.float32))
