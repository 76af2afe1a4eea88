import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerobotics_tpu.core.config import QuadrupedConfig
from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv
from paddlerobotics_tpu.envs import make_env


@pytest.fixture(scope="module")
def benv():
    return BatchedQuadrupedEnv(QuadrupedConfig(), num_envs=4)


def test_shapes(benv):
    state, obs = benv.reset(jax.random.key(0))
    assert obs.shape == (4, 49)
    step = jax.jit(lambda s, a: benv.step(s, a))
    state, obs, rew, done, info = step(state, jnp.zeros((4, 12)))
    assert rew.shape == (4,)
    assert done.shape == (4,)
    assert info["velx"].shape == (4,)
    assert info["ETG_act"].shape == (4, 12)


def test_open_loop_walks(benv):
    state, obs = benv.reset(jax.random.key(1))
    step = jax.jit(lambda s: benv.step(s, jnp.zeros((4, 12))))
    for i in range(150):
        state, obs, rew, done, info = step(state)
        assert not bool(jnp.any(done)), f"fell at {i}"
    x = np.asarray(state.robot.s.pos[0])
    assert np.all(x > 0.2), x


def test_matches_per_env_etg(benv):
    """The SoA ETG residual must equal the per-env path's."""
    env = make_env("Quadrupedal", task="ground")
    state, _ = benv.reset(jax.random.key(0))
    etg_b, _, _, _ = benv._etg_residual(state.etg_w, state.etg_b,
                                     jnp.asarray([5, 5, 5, 5]))
    # per-env
    pstate, _ = env.reset(jax.random.key(0))
    etg_p, _, _, _ = env._etg_residual(pstate.etg_w, pstate.etg_b,
                                       jnp.asarray(5))
    np.testing.assert_allclose(np.asarray(etg_b[:, 0]), np.asarray(etg_p),
                               atol=1e-4)


def test_obs_matches_per_env_at_reset(benv):
    env = make_env("Quadrupedal", task="ground")
    bstate, bobs = benv.reset(jax.random.key(0))
    pstate, pobs = env.reset(jax.random.key(0))
    np.testing.assert_allclose(np.asarray(bobs[0]), np.asarray(pobs),
                               atol=2e-3)


def test_autoreset_resets_fallen(benv):
    state, obs = benv.reset(jax.random.key(2))
    state, obs, rew, done, info = benv.step(
        state, jnp.zeros((4, 12)), donef=jnp.asarray([True, False, False, False]))
    assert bool(done[0])
    assert int(state.step_idx[0]) == 0
    assert int(state.step_idx[1]) == 1


def test_optional_sensors():
    import dataclasses
    from paddlerobotics_tpu.core.config import SensorConfig

    cfg = QuadrupedConfig(sensors=SensorConfig(etg_obs=True, footpose=True,
                                               force_vec=True))
    env = BatchedQuadrupedEnv(cfg, num_envs=2)
    assert env.obs_dim == 49 + 20 + 12 + 3
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape == (2, env.obs_dim)
    state, obs, rew, done, info = env.step(state, jnp.zeros((2, 12)))
    assert obs.shape == (2, env.obs_dim)
    # footpose block: feet below the base in base frame (z < 0)
    foot_z = np.asarray(obs[0, 49 + 20:49 + 20 + 12]).reshape(4, 3)[:, 2]
    assert np.all(foot_z < 0)


def test_gallop_task_uses_bound_pairing():
    """task_mode='gallop' resolves pairing=bound in BOTH env paths and
    the SoA ETG residual still matches the per-env one exactly."""
    import dataclasses
    from paddlerobotics_tpu.core.config import TaskConfig

    cfg = QuadrupedConfig(task=TaskConfig(task_mode="gallop"))
    benv = BatchedQuadrupedEnv(cfg, num_envs=2)
    env = make_env("Quadrupedal", task="gallop")
    assert benv._etg_cfg.pairing == "bound"
    assert env._etg_cfg.pairing == "bound"
    bstate, _ = benv.reset(jax.random.key(0))
    etg_b, _, _, _ = benv._etg_residual(bstate.etg_w, bstate.etg_b,
                                        jnp.asarray([7, 7]))
    pstate, _ = env.reset(jax.random.key(0))
    etg_p, _, _, _ = env._etg_residual(pstate.etg_w, pstate.etg_b,
                                       jnp.asarray(7))
    np.testing.assert_allclose(np.asarray(etg_b[:, 0]), np.asarray(etg_p),
                               atol=1e-4)
    # and it differs from the trot residual of the same weights
    genv = BatchedQuadrupedEnv(QuadrupedConfig(), num_envs=2)
    etg_g, _, _, _ = genv._etg_residual(bstate.etg_w, bstate.etg_b,
                                        jnp.asarray([7, 7]))
    assert float(jnp.abs(etg_b - etg_g).max()) > 1e-3
