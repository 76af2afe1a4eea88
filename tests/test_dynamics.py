import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerobotics_tpu.core.config import SimConfig, TaskConfig
from paddlerobotics_tpu.sim import a1_model as a1
from paddlerobotics_tpu.sim import dynamics, robot, terrain
from paddlerobotics_tpu.sim.dynamics import DynamicsParams
from paddlerobotics_tpu.sim.motor import MotorControlMode


@pytest.fixture(scope="module")
def params():
    return DynamicsParams.default()


@pytest.fixture(scope="module")
def flat():
    return terrain.height_fn(TaskConfig(task_mode="ground"))


def test_free_fall(params):
    """High above ground, zero torque: COM acceleration must equal g."""
    state = dynamics.default_state(height=10.0)
    zero4 = jnp.zeros((4, 3))
    a0, qdd = dynamics.forward_dynamics(
        state, jnp.zeros(12), zero4, zero4, jnp.zeros(3), params)
    # Base acceleration + joint accelerations: the COM of the whole system
    # falls at g. With zero velocity the base-frame linear accel of the base
    # origin combined with qdd-induced relative accel must average to g.
    # Simplest strong check: simulate a few steps and verify COM kinematics.
    cfg = SimConfig()
    h_fn = lambda x, y: jnp.full_like(x, -100.0)  # no ground
    rb = robot.init_robot_state(cfg, height=10.0)
    v0 = com_height_vel(rb.state)
    step = jax.jit(lambda r: robot.control_step(
        r, jnp.zeros(12), params, cfg, h_fn,
        control_mode=MotorControlMode.TORQUE))
    for _ in range(5):
        rb = step(rb)
    t = 5 * cfg.control_dt
    v1 = com_height_vel(rb.state)
    np.testing.assert_allclose(v1 - v0, -9.8 * t, rtol=2e-2)


def com_height_vel(state):
    """Vertical COM velocity of the full robot (world frame)."""
    poses = dynamics.world_poses(state)
    R_b = poses["R_base"]
    w_w = R_b @ state.base_ang_vel
    v_w = R_b @ state.base_lin_vel

    total = 0.0
    mass = 0.0

    def body_vel(origin, R, com, m):
        com_w = origin + R @ com
        v = v_w + jnp.cross(w_w, com_w - state.base_pos)
        return m * v[2], m

    # crude: treat joint rates as zero contribution (they start at zero and
    # stay ~zero in free fall with no torque)
    v, m = body_vel(state.base_pos, R_b, jnp.asarray(a1.TRUNK_COM), a1.TRUNK_MASS)
    total += v; mass += m
    for i in range(4):
        for (okey, rkey, com, lm) in (
            ("o_hip", "R_hip", dynamics.HIP_COM, dynamics.LINK_MASSES[0]),
            ("o_thigh", "R_thigh", dynamics.THIGH_COM, dynamics.LINK_MASSES[1]),
            ("o_calf", "R_calf", dynamics.CALF_COM, dynamics.LINK_MASSES[2]),
        ):
            v, m = body_vel(poses[okey][i], poses[rkey][i],
                            jnp.asarray(com[i]), lm)
            total += v; mass += m
    return float(total / mass)


def test_stand_stability(params, flat):
    """PD hold at the default pose on flat ground: robot must settle upright,
    base height in a plausible band, and not drift."""
    cfg = SimConfig()
    rb = robot.init_robot_state(cfg, height=0.30)
    target = jnp.asarray(a1.INIT_MOTOR_ANGLES)

    step = jax.jit(lambda r: robot.control_step(r, target, params, cfg, flat))
    for _ in range(80):  # ~2 s
        rb = step(rb)
    st = rb.state
    h = float(st.base_pos[2])
    assert 0.2 < h < 0.35, f"base height {h}"
    # upright: quaternion close to identity
    assert abs(float(st.base_quat[0])) > 0.98
    # joint angles near target
    np.testing.assert_allclose(np.asarray(st.q), np.asarray(target), atol=0.25)
    # velocities small (settled)
    assert float(jnp.abs(st.base_lin_vel).max()) < 0.2
    assert float(jnp.abs(st.qd).max()) < 2.0


def test_vmap_batch_consistency(params, flat):
    """vmapped batch step must equal per-env stepping."""
    cfg = SimConfig()
    rb = robot.init_robot_state(cfg, height=0.30)
    batch = jax.tree.map(lambda x: jnp.stack([x, x, x]), rb)
    bparams = jax.tree.map(lambda x: jnp.stack([x, x, x]), params)
    target = jnp.asarray(a1.INIT_MOTOR_ANGLES)
    targets = jnp.stack([target, target + 0.05, target - 0.05])

    stepped = jax.vmap(
        lambda r, a, p: robot.control_step(r, a, p, cfg, flat))(
            batch, targets, bparams)
    single = robot.control_step(rb, target + 0.05, params, cfg, flat)
    np.testing.assert_allclose(
        np.asarray(stepped.state.q[1]), np.asarray(single.state.q), atol=1e-5)


def test_energy_conservation_no_gravity():
    """No gravity, no contact, no torques: kinetic energy ~constant."""
    params = DynamicsParams.default().replace(gravity=jnp.zeros(3))
    cfg = SimConfig()
    rb = robot.init_robot_state(cfg, height=5.0)
    # give it some initial spin and joint velocity
    st = rb.state.replace(
        base_ang_vel=jnp.array([0.5, -0.3, 0.8]),
        base_lin_vel=jnp.array([0.1, 0.2, 0.0]),
        qd=jnp.ones(12) * 0.5)
    rb = rb.replace(state=st)
    h_fn = lambda x, y: jnp.full_like(x, -100.0)

    e0 = kinetic_energy(rb.state, params)
    step = jax.jit(lambda r: robot.control_step(
        r, jnp.zeros(12), params, cfg, h_fn,
        control_mode=MotorControlMode.TORQUE))
    for _ in range(20):
        rb = step(rb)
    e1 = kinetic_energy(rb.state, params)
    assert abs(e1 - e0) / e0 < 0.05, f"energy drifted {e0} -> {e1}"


def kinetic_energy(state, params):
    """Σ ½ vᵀ I v over all bodies, via spatial inertias in body frames."""
    poses = dynamics.world_poses(state)
    (I_hip, I_thigh, I_calf), _ = dynamics._build_leg_inertias(params)
    I0 = dynamics.spatial_inertia(
        jnp.asarray(a1.TRUNK_MASS), jnp.asarray(a1.TRUNK_COM),
        jnp.asarray(a1.TRUNK_INERTIA))

    q = state.q.reshape(4, 3)
    qd = state.qd.reshape(4, 3)
    from paddlerobotics_tpu.core import math3d
    E1 = jnp.swapaxes(math3d.rot_x(q[:, 0]), -1, -2)
    E2 = jnp.swapaxes(math3d.rot_y(q[:, 1]), -1, -2)
    E3 = jnp.swapaxes(math3d.rot_y(q[:, 2]), -1, -2)
    X1 = dynamics.xmat(E1, jnp.asarray(dynamics.HIP_POS_IN_TRUNK))
    X2 = dynamics.xmat(E2, jnp.asarray(dynamics.THIGH_POS_IN_HIP))
    X3 = dynamics.xmat(E3, jnp.asarray(dynamics.CALF_POS_IN_THIGH))
    S1 = jnp.asarray(dynamics.S_HIP)
    S2 = jnp.asarray(dynamics.S_PITCH)

    v0 = jnp.concatenate([state.base_ang_vel, state.base_lin_vel])
    v1 = (X1 @ v0[None, :, None])[..., 0] + S1 * qd[:, 0:1]
    v2 = (X2 @ v1[..., None])[..., 0] + S2 * qd[:, 1:2]
    v3 = (X3 @ v2[..., None])[..., 0] + S2 * qd[:, 2:3]

    e = 0.5 * v0 @ I0 @ v0
    e += 0.5 * jnp.sum(v1[..., None, :] @ I_hip @ v1[..., :, None])
    e += 0.5 * jnp.sum(v2[..., None, :] @ I_thigh @ v2[..., :, None])
    e += 0.5 * jnp.sum(v3[..., None, :] @ I_calf @ v3[..., :, None])
    return float(e)


def test_terrain_stairs():
    h = terrain.height_fn(TaskConfig(task_mode="up_stair", step_height=0.1,
                                     step_width=0.3, terrain_start=1.0))
    xs = jnp.array([0.0, 0.9, 1.1, 1.4, 2.0])
    hs = np.asarray(h(xs, jnp.zeros_like(xs)))
    np.testing.assert_allclose(hs, [0.0, 0.0, 0.1, 0.2, 0.4], atol=1e-6)
