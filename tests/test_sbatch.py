"""Equivalence of the SoA (batch-last) physics vs the per-env vmapped path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerobotics_tpu.core.config import SimConfig, TaskConfig
from paddlerobotics_tpu.sim import a1_model as a1
from paddlerobotics_tpu.sim import dynamics, robot, sbatch, terrain
from paddlerobotics_tpu.sim.dynamics import DynamicsParams
from paddlerobotics_tpu.sim.motor import MotorControlMode


@pytest.fixture(scope="module")
def flat():
    return terrain.height_fn(TaskConfig(task_mode="ground"))


def aos_to_soa(rb: robot.RobotState, B: int) -> sbatch.BRobot:
    """Build a BRobot replicating one per-env RobotState B times."""
    st = rb.state
    rep = lambda x, shape: jnp.broadcast_to(
        jnp.asarray(x, jnp.float32).reshape(shape + (1,)), shape + (B,))
    s = sbatch.BQuadState(
        pos=rep(st.base_pos, (3,)), quat=rep(st.base_quat, (4,)),
        w=rep(st.base_ang_vel, (3,)), v=rep(st.base_lin_vel, (3,)),
        q=rep(st.q, (12,)), qd=rep(st.qd, (12,)))
    contact = sbatch.BContact(
        foot_pos=jnp.zeros((3, 4, B)),
        foot_contact=jnp.zeros((4, B), bool),
        knee_contact=jnp.zeros((4, B), bool),
        base_contact=jnp.zeros((B,), bool))
    row = jnp.concatenate([s.q, s.qd, s.quat, s.w], axis=0)
    hist = jnp.broadcast_to(row[None], (sbatch.SUB_HIST_LEN, sbatch.OBS_ROW,
                                        B))
    return sbatch.BRobot(
        s=s, last_action=s.q,
        tau=jnp.zeros((12, B)), contact=contact, obs_hist=hist,
        hist_head=jnp.asarray(sbatch.SUB_HIST_LEN - 1, jnp.int32))


def logical_slot(rb: sbatch.BRobot, k: int):
    """Ring row that is k substeps old (0 = newest)."""
    L = rb.obs_hist.shape[0]
    return rb.obs_hist[(int(rb.hist_head) - k) % L]


def test_soa_matches_vmap_path(flat):
    """Step both implementations 5 control steps from the same state and
    compare trajectories. Both paths now share the reference PD-input
    semantics (pd_latency = 0 → current state), so no latency special-
    casing is needed for them to track each other."""
    cfg = SimConfig()
    B = 3
    params = DynamicsParams.default()
    rb_aos = robot.init_robot_state(cfg, height=0.30)
    rb_soa = aos_to_soa(rb_aos, B)
    bparams = sbatch.BDynParams.default(B)

    target = jnp.asarray(a1.INIT_MOTOR_ANGLES) + 0.05
    targets_b = jnp.broadcast_to(target[:, None], (12, B))

    step_aos = jax.jit(lambda r: robot.control_step(r, target, params, cfg, flat))
    step_soa = jax.jit(lambda r: sbatch.control_step(r, targets_b, bparams,
                                                     cfg, flat))
    for i in range(5):
        rb_aos = step_aos(rb_aos)
        rb_soa = step_soa(rb_soa)
        q_a = np.asarray(rb_aos.state.q)
        q_s = np.asarray(rb_soa.s.q[:, 0])
        np.testing.assert_allclose(q_s, q_a, atol=2e-3,
                                   err_msg=f"diverged at step {i}")
    np.testing.assert_allclose(np.asarray(rb_soa.s.pos[:, 0]),
                               np.asarray(rb_aos.state.base_pos), atol=5e-3)
    np.testing.assert_allclose(np.asarray(rb_soa.s.quat[:, 0]),
                               np.asarray(rb_aos.state.base_quat), atol=2e-3)


def test_soa_free_fall():
    cfg = SimConfig()
    B = 2
    bparams = sbatch.BDynParams.default(B)
    rb = sbatch.init_robot(B, height=10.0)
    h_fn = lambda x, y: jnp.full_like(x, -100.0)
    step = jax.jit(lambda r: sbatch.control_step(
        r, jnp.zeros((12, B)), bparams, cfg, h_fn, torque_mode=True))
    for _ in range(5):
        rb = step(rb)
    t = 5 * cfg.control_dt
    # base z velocity (world ≈ base frame, no rotation without torque):
    vz = float(rb.s.v[2, 0])
    np.testing.assert_allclose(vz, -9.8 * t, rtol=5e-2)


def test_soa_stand(flat):
    cfg = SimConfig()
    B = 2
    bparams = sbatch.BDynParams.default(B)
    rb = sbatch.init_robot(B, height=0.30)
    target = jnp.broadcast_to(
        jnp.asarray(a1.INIT_MOTOR_ANGLES)[:, None], (12, B))
    step = jax.jit(lambda r: sbatch.control_step(r, target, bparams, cfg, flat))
    for _ in range(80):
        rb = step(rb)
    h = float(rb.s.pos[2, 0])
    assert 0.2 < h < 0.35, h
    assert abs(float(rb.s.quat[0, 0])) > 0.98
    assert float(jnp.abs(rb.s.qd).max()) < 2.0


def test_delayed_obs_weights():
    B = 3
    rb = sbatch.init_robot(B, height=0.3)
    # fill hist so the row of logical AGE k holds the value k
    # (init head = L-1, so age k lives at physical L-1-k)
    L = sbatch.SUB_HIST_LEN
    hist = jnp.stack([jnp.full((sbatch.OBS_ROW, B), float(L - 1 - p))
                      for p in range(L)])
    rb = rb.replace(obs_hist=hist)
    sdt = 0.0026
    latency = jnp.asarray([0.0, sdt, 1.5 * sdt])  # 0, 1, 1.5 substeps
    q, qd, quat, w = sbatch.delayed_obs(rb, latency, sdt)
    np.testing.assert_allclose(np.asarray(q[0]), [0.0, 1.0, 1.5], atol=1e-5)
    np.testing.assert_allclose(np.asarray(quat[0]), [0.0, 1.0, 1.5],
                               atol=1e-5)


def test_delayed_obs_tapped_matches_full():
    """The tapped fast path equals the full-ring blend for any latency
    within its reach, at ANY rolling-head position (incl. wrap)."""
    B = 4
    L = sbatch.SUB_HIST_LEN
    rb = sbatch.init_robot(B, height=0.3)
    hist = jax.random.normal(jax.random.key(0), (L, sbatch.OBS_ROW, B))
    sdt = 0.0026
    latency = jnp.asarray([0.0, 0.002, 0.5 * sdt, 2.9 * sdt])
    for head in (0, 3, L - 1):
        r = rb.replace(obs_hist=hist,
                       hist_head=jnp.asarray(head, jnp.int32))
        full = sbatch.delayed_obs(r, latency, sdt)
        for taps in (4, 6):
            fast = sbatch.delayed_obs(r, latency, sdt, taps=taps)
            for a, b in zip(fast, full):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-5)
    # out-of-reach latency clips to the tap horizon (documented)
    r = rb.replace(obs_hist=hist, hist_head=jnp.asarray(5, jnp.int32))
    fast = sbatch.delayed_obs(r, jnp.full((B,), 10 * sdt), sdt, taps=2)
    lim = sbatch.delayed_obs(r, jnp.full((B,), 0.999 * sdt), sdt)
    np.testing.assert_allclose(np.asarray(fast[0]), np.asarray(lim[0]),
                               atol=1e-5)


def test_substep_ring_timeline(flat):
    """After a control step the ring holds the n substep states newest-
    first, continuing into the previous step's snapshots."""
    cfg = SimConfig()
    B = 2
    p = sbatch.BDynParams.default(B)
    rb = sbatch.init_robot(B, height=0.30)
    target = jnp.broadcast_to(
        jnp.asarray(a1.INIT_MOTOR_ANGLES)[:, None], (12, B)) + 0.02
    rb1 = sbatch.control_step(rb, target, p, cfg, flat)
    # logical slot 0 == final state
    np.testing.assert_allclose(np.asarray(logical_slot(rb1, 0)[:12]),
                               np.asarray(rb1.s.q), atol=0)
    np.testing.assert_allclose(np.asarray(logical_slot(rb1, 0)[24:28]),
                               np.asarray(rb1.s.quat), atol=0)
    # logical slot n == pre-step state (the old newest row)
    n = cfg.action_repeat
    np.testing.assert_allclose(np.asarray(logical_slot(rb1, n)[:12]),
                               np.asarray(rb.s.q), atol=0)
    # slots strictly newest-first across steps (incl. a ring wrap after
    # L/n steps)
    rb2 = rb1
    for _ in range(1 + sbatch.SUB_HIST_LEN // n):
        prev = rb2
        rb2 = sbatch.control_step(rb2, target, p, cfg, flat)
        np.testing.assert_allclose(np.asarray(logical_slot(rb2, n)),
                                   np.asarray(logical_slot(prev, 0)),
                                   atol=0)


def test_pd_latency_delays_pd_input(flat):
    """cfg.pd_latency > 0 feeds the PD loop an older (q, q̇) — the torque
    trajectory must differ from the zero-latency default, and the
    1-substep case must equal PD on the previous substep state."""
    B = 2
    p = sbatch.BDynParams.default(B)
    target = jnp.broadcast_to(
        jnp.asarray(a1.INIT_MOTOR_ANGLES)[:, None], (12, B)) + 0.15
    rb0 = sbatch.init_robot(B, height=0.30)
    cfg0 = SimConfig()
    cfg1 = SimConfig(pd_latency=cfg0.substep_dt)  # exactly 1 substep
    rb_a = sbatch.control_step(rb0, target, p, cfg0, flat)
    rb_b = sbatch.control_step(rb0, target, p, cfg1, flat)
    assert float(jnp.max(jnp.abs(rb_a.tau - rb_b.tau))) > 1e-4
    # Manual check of the final substep's torque for the delayed path.
    # At substep i the ring head is the end-of-substep-(i-1) state and a
    # 1-substep latency reads one entry older (reference
    # _GetDelayedObservation: n_steps_ago=1 → history[1]): for i = n-1
    # that is the end of substep n-3 = post-step logical slot 2.
    q_in = logical_slot(rb_b, 2)[:12]
    qd_in = logical_slot(rb_b, 2)[12:24]
    # final interpolated command = target
    tau_exp = jnp.clip(-p.motor_kp * (q_in - target) - p.motor_kd * qd_in,
                       -a1.TORQUE_LIMIT[0], a1.TORQUE_LIMIT[0])
    np.testing.assert_allclose(np.asarray(rb_b.tau), np.asarray(tau_exp),
                               atol=1e-5)
