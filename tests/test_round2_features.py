"""Round-2 feature tests: HYBRID act mode, dynamic_vec sensor,
per-channel sensor noise, per-episode DR / x_noise under autoreset, and
burst-coherent random pushes — each cross-checked per-env vs batched
where both paths implement the feature."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerobotics_tpu.core.config import (QuadrupedConfig, RandomConfig,
                                            SensorConfig, TrainConfig)
from paddlerobotics_tpu.envs import randomize
from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv
from paddlerobotics_tpu.envs.quadruped_env import QuadrupedEnv
from paddlerobotics_tpu.sim import a1_model as a1


def _cfg(**kw):
    cfg = QuadrupedConfig()
    for k, v in kw.items():
        cfg = dataclasses.replace(cfg, **{k: v})
    return cfg


# -- HYBRID motor mode --------------------------------------------------------

def test_hybrid_action_dim():
    cfg = _cfg(train=TrainConfig(act_mode="hybrid"))
    benv = BatchedQuadrupedEnv(cfg, num_envs=2)
    penv = QuadrupedEnv(cfg)
    assert benv.action_dim == 60 and penv.action_dim == 60
    assert benv.act_bound.shape == (60,)
    assert np.allclose(benv.act_bound, penv.act_bound)
    assert np.allclose(benv.act_offset, penv.act_offset)


def _hybrid_from_pos(pos_res, B=None):
    """Raw hybrid command equal to POSITION mode with default gains."""
    kp0 = np.asarray(a1.MOTOR_KP)
    kd0 = np.asarray(a1.MOTOR_KD)
    z = np.zeros(12)
    a5 = np.stack([pos_res, kp0, z, kd0, z], axis=1).reshape(60)
    if B is not None:
        return jnp.broadcast_to(jnp.asarray(a5), (B, 60))
    return jnp.asarray(a5)


def test_hybrid_default_gains_equals_position_batched():
    pos = _cfg(train=TrainConfig(act_mode="traj"))
    hyb = _cfg(train=TrainConfig(act_mode="hybrid"))
    envp = BatchedQuadrupedEnv(pos, num_envs=2)
    envh = BatchedQuadrupedEnv(hyb, num_envs=2)
    sp, _ = envp.reset(jax.random.key(0))
    sh, _ = envh.reset(jax.random.key(0))
    res = 0.05 * np.sin(np.arange(12))
    act_p = jnp.broadcast_to(jnp.asarray(res), (2, 12))
    act_h = _hybrid_from_pos(res, B=2)
    step_p = jax.jit(lambda s: envp.step(s, act_p))
    step_h = jax.jit(lambda s: envh.step(s, act_h))
    for _ in range(5):
        sp, _, rp, _, _ = step_p(sp)
        sh, _, rh, _, _ = step_h(sh)
    np.testing.assert_allclose(np.asarray(sh.robot.s.q),
                               np.asarray(sp.robot.s.q), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sh.robot.s.pos),
                               np.asarray(sp.robot.s.pos), atol=1e-5)


def test_hybrid_default_gains_equals_position_per_env():
    pos = _cfg(train=TrainConfig(act_mode="traj"))
    hyb = _cfg(train=TrainConfig(act_mode="hybrid"))
    envp = QuadrupedEnv(pos)
    envh = QuadrupedEnv(hyb)
    sp, _ = envp.reset(jax.random.key(0))
    sh, _ = envh.reset(jax.random.key(0))
    res = 0.05 * np.sin(np.arange(12))
    act_h = _hybrid_from_pos(res)
    step_p = jax.jit(lambda s: envp.step(s, jnp.asarray(res)))
    step_h = jax.jit(lambda s: envh.step(s, act_h))
    for _ in range(5):
        sp, _, _, _, _ = step_p(sp)
        sh, _, _, _, _ = step_h(sh)
    np.testing.assert_allclose(np.asarray(sh.robot.state.q),
                               np.asarray(sp.robot.state.q), atol=1e-5)


def test_hybrid_through_pallas_matches_soa():
    """act_mode='hybrid' with use_pallas=True (VERDICT r2 weak #3): the
    megakernel env path must match the fused-XLA env path exactly."""
    import dataclasses as dc
    hyb = _cfg(train=TrainConfig(act_mode="hybrid"))
    hyb_p = dc.replace(hyb, sim=dc.replace(hyb.sim, use_pallas=True,
                                           pallas_block=2))
    env_s = BatchedQuadrupedEnv(hyb, num_envs=2)
    env_p = BatchedQuadrupedEnv(hyb_p, num_envs=2)
    ss, _ = env_s.reset(jax.random.key(0))
    sp, _ = env_p.reset(jax.random.key(0))
    act = np.zeros((2, 60), np.float32).reshape(2, 12, 5)
    act[:, :, 0] = 0.03
    act[:, :, 1] = np.asarray(a1.MOTOR_KP)
    act[:, :, 2] = 0.2
    act[:, :, 3] = np.asarray(a1.MOTOR_KD)
    act[:, :, 4] = 1.0
    act = jnp.asarray(act.reshape(2, 60))
    for _ in range(3):
        ss, _, rs, _, _ = env_s.step(ss, act)
        sp, _, rp, _, _ = env_p.step(sp, act)
    np.testing.assert_allclose(np.asarray(sp.robot.s.q),
                               np.asarray(ss.robot.s.q), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rp), np.asarray(rs), atol=1e-4)


def test_hybrid_feedforward_changes_motion():
    hyb = _cfg(train=TrainConfig(act_mode="hybrid"))
    env = BatchedQuadrupedEnv(hyb, num_envs=2)
    s0, _ = env.reset(jax.random.key(0))
    base = np.asarray(_hybrid_from_pos(np.zeros(12), B=2))
    ff = base.copy().reshape(2, 12, 5)
    ff[:, :, 4] = 3.0            # constant feedforward torque
    step = jax.jit(env.step)
    s_a, _, _, _, _ = step(s0, jnp.asarray(base))
    s_b, _, _, _, _ = step(s0, jnp.asarray(ff.reshape(2, 60)))
    assert float(jnp.abs(s_a.robot.s.q - s_b.robot.s.q).max()) > 1e-4


# -- dynamic_vec sensor -------------------------------------------------------

def test_dynamic_vec_obs_dim_and_echo():
    cfg = _cfg(sensors=SensorConfig(dynamic_vec=True),
               random=RandomConfig(random_dynamics=True))
    assert cfg.sensors.base_obs_dim == 49 + 48
    benv = BatchedQuadrupedEnv(cfg, num_envs=4)
    penv = QuadrupedEnv(cfg)
    bs, bobs = benv.reset(jax.random.key(3))
    ps, pobs = penv.reset(jax.random.key(3))
    assert bobs.shape == (4, 97) and pobs.shape == (97,)
    # echo occupies the slice before force_vec (absent here): last 48
    echo = np.asarray(bobs[:, 49:97])
    assert np.all(np.abs(echo) <= 1.0)
    # different envs drew different dynamics → different echoes
    assert np.abs(echo[0] - echo[1]).max() > 1e-3


def test_dynamics_to_normalized_inverts_param2dynamic():
    """The echo must preserve everything the physics sees: feeding it
    back through param2dynamic reproduces the same physical params
    (clipped coordinates saturate consistently)."""
    rng = np.random.RandomState(0)
    p = rng.uniform(-1, 1, 48)
    dyn = randomize.param2dynamic(jnp.asarray(p))
    back = randomize.dynamics_to_normalized(dyn)
    dyn2 = randomize.param2dynamic(back)
    for a, b in zip(jax.tree.leaves(dyn), jax.tree.leaves(dyn2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4)
    # and is exact where the forward map is affine-invertible (kp range)
    np.testing.assert_allclose(np.asarray(back)[21:33], p[21:33],
                               atol=1e-5)


# -- per-channel sensor noise -------------------------------------------------

def test_batched_noise_is_per_channel():
    cfg = _cfg(sensors=SensorConfig(noise=True))
    env = BatchedQuadrupedEnv(cfg, num_envs=64)
    clean = BatchedQuadrupedEnv(_cfg(), num_envs=64)
    s_n, obs_n = env.reset(jax.random.key(0))
    s_c, obs_c = clean.reset(jax.random.key(0))
    d = np.asarray(obs_n - obs_c)
    # contact channels (3:7) carry no noise
    assert np.abs(d[:, 3:7]).max() == 0.0
    # normalized rpy noise std ≈ 0.01/0.1 = 0.1; q noise ≈ 0.01/0.1
    assert 0.02 < d[:, 7:10].std() < 0.5
    assert 0.02 < d[:, 13:25].std() < 0.5
    # velocity (dis) noise present
    assert d[:, 0:3].std() > 0.005


# -- per-episode DR + x_noise under autoreset --------------------------------

def test_autoreset_resamples_dynamics():
    cfg = _cfg(random=RandomConfig(random_dynamics=True))
    env = BatchedQuadrupedEnv(cfg, num_envs=8)
    state, _ = env.reset(jax.random.key(0))
    kp_before = np.asarray(state.dyn.motor_kp)
    state, _, _, done, _ = env.step(state, jnp.zeros((8, 12)),
                                    donef=True)
    assert bool(jnp.all(done))
    kp_after = np.asarray(state.dyn.motor_kp)
    assert np.abs(kp_after - kp_before).max() > 1.0
    # resampled values stay inside the reference ranges
    assert kp_after.min() >= 20.0 and kp_after.max() <= 200.0


def test_autoreset_applies_x_noise():
    cfg = _cfg(train=TrainConfig(x_noise=True))
    env = BatchedQuadrupedEnv(cfg, num_envs=8)
    state, _ = env.reset(jax.random.key(0))
    state, _, _, done, _ = env.step(state, jnp.zeros((8, 12)), donef=True)
    x = np.asarray(state.robot.s.pos[0])
    # fresh spawns are jittered: not all at the same x
    assert x.std() > 1e-4


# -- burst-coherent random pushes --------------------------------------------

def test_push_constant_within_burst():
    cfg = _cfg(random=RandomConfig(random_force=True, max_force=20.0))
    env = BatchedQuadrupedEnv(cfg, num_envs=4)
    state, _ = env.reset(jax.random.key(1))
    step = jax.jit(lambda s: env.step(s, jnp.zeros((4, 12)),
                                      autoreset=False))
    forces = []
    for i in range(90):
        state, _, _, done, _ = step(state)
        forces.append(np.asarray(state.dyn.external_force))
    forces = np.stack(forces)          # (90, 3, 4)
    # steps 0..74 inactive, 75..84 active burst
    assert np.abs(forces[:74]).max() == 0.0
    active = forces[75:84]
    assert np.abs(active).max() > 0.0
    # constant within the burst
    assert np.abs(active - active[0]).max() < 1e-5
    assert np.abs(forces[86:]).max() == 0.0


def test_push_per_env_matches_semantics():
    cfg = _cfg(random=RandomConfig(random_force=True, max_force=20.0))
    env = QuadrupedEnv(cfg)
    state, _ = env.reset(jax.random.key(1))
    step = jax.jit(lambda s: env.step(s, jnp.zeros(12)))
    mags = []
    for i in range(90):
        state, _, _, _, _ = step(state)
        mags.append(float(jnp.linalg.norm(state.dyn.external_force)))
    mags = np.asarray(mags)
    assert np.all(mags[:74] == 0.0)
    assert mags[75:84].max() > 0.0
    assert np.abs(mags[75:84] - mags[75]).max() < 1e-5


# -- on-rack mode and motor overheat protection -------------------------------

def test_on_rack_base_welded():
    from paddlerobotics_tpu.core.config import SimConfig
    cfg = _cfg(sim=dataclasses.replace(SimConfig(), on_rack=True))
    env = BatchedQuadrupedEnv(cfg, num_envs=2)
    state, _ = env.reset(jax.random.key(0))
    p0 = np.asarray(state.robot.s.pos)
    act = 0.2 * jnp.ones((2, 12))
    step = jax.jit(lambda s: env.step(s, act, autoreset=False))
    for _ in range(10):
        state, _, _, _, _ = step(state)
    np.testing.assert_allclose(np.asarray(state.robot.s.pos), p0, atol=1e-6)
    # joints did move
    q = np.asarray(state.robot.s.q)
    assert np.abs(q - np.asarray(a1.INIT_MOTOR_ANGLES)[:, None]).max() > 0.05


def test_overheat_latch_batched():
    from paddlerobotics_tpu.core.config import SimConfig
    sim = dataclasses.replace(SimConfig(), motor_overheat_protection=True,
                              overheat_shutdown_torque=1.0,
                              overheat_shutdown_time=0.1)
    cfg = _cfg(sim=sim, train=TrainConfig(act_mode="torque"))
    env = BatchedQuadrupedEnv(cfg, num_envs=2)
    state, _ = env.reset(jax.random.key(0))
    act = 5.0 * jnp.ones((2, 12))
    step = jax.jit(lambda s: env.step(s, act, autoreset=False))
    for i in range(12):
        state, _, _, _, _ = step(state)
    # latch tripped (0.1s / 0.026s ≈ 4 steps) → motors off, zero torque
    assert not bool(jnp.any(state.motor_on))
    assert float(jnp.abs(state.robot.tau).max()) == 0.0


def test_overheat_latch_per_env():
    from paddlerobotics_tpu.core.config import SimConfig
    sim = dataclasses.replace(SimConfig(), motor_overheat_protection=True,
                              overheat_shutdown_torque=1.0,
                              overheat_shutdown_time=0.1)
    cfg = _cfg(sim=sim, train=TrainConfig(act_mode="torque"))
    env = QuadrupedEnv(cfg)
    state, _ = env.reset(jax.random.key(0))
    act = 5.0 * jnp.ones(12)
    step = jax.jit(lambda s: env.step(s, act))
    for i in range(12):
        state, _, _, _, _ = step(state)
    assert not bool(jnp.any(state.motor_on))
    assert float(jnp.abs(state.robot.applied_torque).max()) == 0.0


def test_dr_scale_interpolates_from_nominal():
    """Curriculum semantics (round-3 fix, docs/dr_study.md addendum):
    dr_scale interpolates PHYSICAL dynamics between the true nominal
    (DynamicsParams.default) at 0 and a full param2dynamic draw at 1 —
    NOT toward the reference mapping's harsh p=0 center (friction 0.2,
    40 ms latency)."""
    import jax.numpy as jnp

    from paddlerobotics_tpu.sim.dynamics import DynamicsParams

    k = jax.random.key(3)
    d0 = randomize.sample_dynamics(k, scale=0.0)
    dn = DynamicsParams.default()
    for a, b in zip(jax.tree.leaves(d0), jax.tree.leaves(dn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
    # scale 1 == the raw reference draw (the round-2 full-range results
    # are unaffected by the curriculum change)
    d1 = randomize.sample_dynamics(k, scale=1.0)
    p = jax.random.uniform(k, (randomize.NUM_DYNAMIC_PARAMS,),
                           minval=-1.0, maxval=1.0)
    dref = randomize.param2dynamic(p)
    for a, b in zip(jax.tree.leaves(d1), jax.tree.leaves(dref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
    # midpoint: friction multiplier strictly between nominal (1.0) and
    # the draw's — never pinned at the p=0 ice center
    dh = randomize.sample_dynamics(k, scale=0.5)
    f_mid = float(dh.foot_friction)
    lo, hi = sorted([float(dn.foot_friction), float(dref.foot_friction)])
    assert lo <= f_mid <= hi
    np.testing.assert_allclose(
        f_mid, 0.5 * (float(dn.foot_friction) +
                      float(dref.foot_friction)), rtol=1e-5)


def test_dr_scale_jitter_draws_span_to_nominal():
    """dr_scale_jitter: per-draw scale ~ U(0, scale) — a batch of draws
    must span from near-nominal to the full scale, and its mean
    deviation from nominal must be about half the no-jitter mean."""
    from paddlerobotics_tpu.sim.dynamics import DynamicsParams

    dn = DynamicsParams.default()
    keys = jax.random.split(jax.random.key(7), 512)
    dj = jax.vmap(lambda k: randomize.sample_dynamics(
        k, scale=1.0, jitter=True))(keys)
    df = jax.vmap(lambda k: randomize.sample_dynamics(
        k, scale=1.0, jitter=False))(keys)
    dev_j = np.abs(np.asarray(dj.foot_friction) -
                   float(dn.foot_friction))
    dev_f = np.abs(np.asarray(df.foot_friction) -
                   float(dn.foot_friction))
    # some draws are near nominal under jitter
    assert dev_j.min() < 0.05 * dev_f.mean()
    # mean deviation roughly halves (U(0,1) has mean 1/2)
    assert 0.35 < dev_j.mean() / dev_f.mean() < 0.65
