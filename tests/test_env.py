import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerobotics_tpu.envs import make_env
from paddlerobotics_tpu.core.config import QuadrupedConfig


@pytest.fixture(scope="module")
def env():
    return make_env("Quadrupedal", task="ground")


def test_obs_dim_matches_reference_layout(env):
    """dis(3)+contact(4)+imu(6)+motor(24)+ETG(12) = 49 (deployment/test.py:26-46)."""
    assert env.obs_dim == 49
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape == (49,)


def test_reset_standing(env):
    state, obs = env.reset(jax.random.key(0))
    assert float(state.robot.state.base_pos[2]) > 0.2
    assert not bool(state.done)


def test_step_runs_and_info_channels(env):
    state, obs = env.reset(jax.random.key(0))
    step = jax.jit(lambda s, a: env.step(s, a))
    state, obs, rew, done, info = step(state, jnp.zeros(12))
    for key in ("torso", "up", "feet", "tau", "stand", "badfoot",
                "footcontact", "velx", "rew", "ETG_act", "success"):
        assert key in info, key
    assert obs.shape == (49,)
    assert np.isfinite(float(rew))


def test_open_loop_etg_walks_forward(env):
    """BASELINE config 1: fixed open-loop ETG gait, flat ground, zero policy.
    The robot must locomote forward without falling for 150 control steps
    (~4 s)."""
    state, obs = env.reset(jax.random.key(1))
    step = jax.jit(lambda s: env.step(s, jnp.zeros(12)))

    x0 = float(state.robot.state.base_pos[0])
    fell = False
    for i in range(150):
        state, obs, rew, done, info = step(state)
        if bool(done):
            fell = True
            break
    x1 = float(state.robot.state.base_pos[0])
    assert not fell, f"robot fell at step {i}, pos={state.robot.state.base_pos}"
    assert x1 - x0 > 0.2, f"robot did not advance: dx={x1-x0:.3f}"


def test_vmapped_env(env):
    B = 8
    keys = jax.random.split(jax.random.key(0), B)
    states, obss = jax.vmap(env.reset)(keys)
    assert obss.shape == (B, 49)
    vstep = jax.jit(jax.vmap(lambda s, a: env.step(s, a)))
    actions = jnp.zeros((B, 12))
    states, obss, rews, dones, infos = vstep(states, actions)
    assert rews.shape == (B,)
    assert infos["velx"].shape == (B,)


def test_autoreset(env):
    state, obs = env.reset(jax.random.key(2))
    # force done via donef
    nstate, obs, rew, done, info = env.step_autoreset(
        state, jnp.zeros(12), donef=True)
    assert bool(done)
    # state must be a fresh episode
    assert int(nstate.step_idx) == 0


def test_stairs_env_builds():
    env = make_env("Quadrupedal", task="stairstair", step_height=0.08,
                   step_width=0.3)
    state, obs = env.reset(jax.random.key(0))
    state, obs, rew, done, info = env.step(state, jnp.zeros(12))
    assert np.isfinite(float(rew))
