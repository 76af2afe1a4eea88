"""Pallas physics megakernel vs the SoA JAX path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerobotics_tpu.core.config import SimConfig, TaskConfig
from paddlerobotics_tpu.ops.pallas.physics_step import control_step_pallas
from paddlerobotics_tpu.sim import a1_model as a1
from paddlerobotics_tpu.sim import sbatch, terrain


def test_megakernel_matches_soa_path():
    cfg = SimConfig()
    h_fn = terrain.height_fn(TaskConfig(task_mode="ground"))
    B = 8
    rb = sbatch.init_robot(B, height=0.30)
    p = sbatch.BDynParams.default(B)
    target = jnp.broadcast_to(
        jnp.asarray(a1.INIT_MOTOR_ANGLES, jnp.float32)[:, None],
        (12, B)) + 0.03

    rb_ref = rb
    rb_pal = rb
    for _ in range(3):
        rb_ref = sbatch.control_step(rb_ref, target, p, cfg, h_fn)
        rb_pal = control_step_pallas(rb_pal, target, p, cfg, h_fn,
                                     block_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(rb_pal.s.q),
                               np.asarray(rb_ref.s.q), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rb_pal.s.pos),
                               np.asarray(rb_ref.s.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rb_pal.s.quat),
                               np.asarray(rb_ref.s.quat), atol=1e-5)
    assert bool(jnp.all(rb_pal.contact.foot_contact ==
                        rb_ref.contact.foot_contact))
    np.testing.assert_allclose(np.asarray(rb_pal.tau),
                               np.asarray(rb_ref.tau), atol=1e-4)


def test_megakernel_substep_ring_matches_soa():
    """The per-substep obs stack → ring update must equal the SoA path's
    (policy-obs latency source, minitaur.ReceiveObservation semantics)."""
    cfg = SimConfig()
    h_fn = terrain.height_fn(TaskConfig(task_mode="ground"))
    B = 4
    rb = sbatch.init_robot(B, height=0.30)
    p = sbatch.BDynParams.default(B)
    target = jnp.broadcast_to(
        jnp.asarray(a1.INIT_MOTOR_ANGLES, jnp.float32)[:, None],
        (12, B)) + 0.05
    rb_ref = sbatch.control_step(rb, target, p, cfg, h_fn)
    rb_pal = control_step_pallas(rb, target, p, cfg, h_fn, block_b=4,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(rb_pal.obs_hist),
                               np.asarray(rb_ref.obs_hist), atol=1e-5)


def test_megakernel_hybrid_matches_soa():
    """HYBRID motor law (qd_ref/tau_ff) through the megakernel equals the
    sbatch path (laikago_motor.py:152-166 semantics)."""
    cfg = SimConfig()
    h_fn = terrain.height_fn(TaskConfig(task_mode="ground"))
    B = 4
    rb = sbatch.init_robot(B, height=0.30)
    p = sbatch.BDynParams.default(B)
    target = jnp.broadcast_to(
        jnp.asarray(a1.INIT_MOTOR_ANGLES, jnp.float32)[:, None],
        (12, B)) + 0.02
    qd_ref = 0.3 * jnp.broadcast_to(
        jnp.sin(jnp.arange(12.0))[:, None], (12, B))
    tau_ff = 1.5 * jnp.broadcast_to(
        jnp.cos(jnp.arange(12.0))[:, None], (12, B))
    rb_ref = rb
    rb_pal = rb
    for _ in range(3):
        rb_ref = sbatch.control_step(rb_ref, target, p, cfg, h_fn,
                                     qd_ref=qd_ref, tau_ff=tau_ff)
        rb_pal = control_step_pallas(rb_pal, target, p, cfg, h_fn,
                                     qd_ref=qd_ref, tau_ff=tau_ff,
                                     block_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(rb_pal.s.q),
                               np.asarray(rb_ref.s.q), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rb_pal.tau),
                               np.asarray(rb_ref.tau), atol=1e-4)
    # feedforward actually bit: differs from the plain-PD trajectory
    rb_plain = sbatch.control_step(rb, target, p, cfg, h_fn)
    assert float(jnp.abs(rb_pal.s.q - rb_plain.s.q).max()) > 1e-4


def test_megakernel_pd_latency_matches_soa():
    """pd_latency-delayed PD input through the megakernel equals the
    sbatch path (minitaur._GetPDObservation:1195-1199)."""
    h_fn = terrain.height_fn(TaskConfig(task_mode="ground"))
    B = 4
    rb = sbatch.init_robot(B, height=0.30)
    p = sbatch.BDynParams.default(B)
    cfg = SimConfig(pd_latency=1.5 * SimConfig().substep_dt)
    target = jnp.broadcast_to(
        jnp.asarray(a1.INIT_MOTOR_ANGLES, jnp.float32)[:, None],
        (12, B)) + 0.1
    rb_ref = rb
    rb_pal = rb
    for _ in range(2):
        rb_ref = sbatch.control_step(rb_ref, target, p, cfg, h_fn)
        rb_pal = control_step_pallas(rb_pal, target, p, cfg, h_fn,
                                     block_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(rb_pal.s.q),
                               np.asarray(rb_ref.s.q), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rb_pal.tau),
                               np.asarray(rb_ref.tau), atol=1e-4)
    # and the delayed path genuinely differs from zero-latency PD
    rb_zero = sbatch.control_step(rb, target, p, SimConfig(), h_fn)
    assert float(jnp.abs(rb_pal.tau - rb_zero.tau).max()) > 1e-4


def test_megakernel_stairs_terrain():
    cfg = SimConfig()
    h_fn = terrain.height_fn(TaskConfig(task_mode="up_stair",
                                        step_height=0.08, step_width=0.3))
    B = 4
    rb = sbatch.init_robot(B, height=0.30)
    p = sbatch.BDynParams.default(B)
    target = jnp.broadcast_to(
        jnp.asarray(a1.INIT_MOTOR_ANGLES, jnp.float32)[:, None], (12, B))
    rb_ref = sbatch.control_step(rb, target, p, cfg, h_fn)
    rb_pal = control_step_pallas(rb, target, p, cfg, h_fn, block_b=4,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(rb_pal.s.q),
                               np.asarray(rb_ref.s.q), atol=1e-5)


def test_megakernel_short_ring_matches_soa():
    """Single-control-step ring regime (L < action_repeat, the no-DR
    default in batched_env): the kernel writes only the newest L
    snapshot rows; both paths must agree on the ring and on the state."""
    cfg = SimConfig()
    h_fn = terrain.height_fn(TaskConfig(task_mode="ground"))
    B = 4
    for L in (2, 3):
        rb = sbatch.init_robot(B, height=0.30, hist_len=L)
        p = sbatch.BDynParams.default(B)
        target = jnp.broadcast_to(
            jnp.asarray(a1.INIT_MOTOR_ANGLES, jnp.float32)[:, None],
            (12, B)) + 0.05
        rb_ref, rb_pal = rb, rb
        for _ in range(2):
            rb_ref = sbatch.control_step(rb_ref, target, p, cfg, h_fn)
            rb_pal = control_step_pallas(rb_pal, target, p, cfg, h_fn,
                                         block_b=4, interpret=True)
        np.testing.assert_allclose(np.asarray(rb_pal.obs_hist),
                                   np.asarray(rb_ref.obs_hist), atol=1e-5)
        np.testing.assert_allclose(np.asarray(rb_pal.s.q),
                                   np.asarray(rb_ref.s.q), atol=1e-5)
        assert int(rb_ref.hist_head) == int(rb_pal.hist_head) == L - 1
        # the short ring holds the NEWEST L rows: its last row must be
        # the current post-substep state snapshot
        np.testing.assert_allclose(np.asarray(rb_ref.obs_hist[-1, :12]),
                                   np.asarray(rb_ref.s.q), atol=1e-6)
