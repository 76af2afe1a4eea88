"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerobotics_tpu.parallel import sharding as sh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_mesh_shapes():
    mesh = sh.make_mesh(n_env=4, n_model=2)
    assert dict(mesh.shape) == {"env": 4, "model": 2}
    mesh = sh.make_mesh()
    assert mesh.shape["env"] == 8


def test_env_state_sharded_step_matches_single_device():
    """A sharded batched env step must produce the same numbers as the
    unsharded one."""
    from paddlerobotics_tpu.core.config import QuadrupedConfig
    from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv

    B = 16
    env = BatchedQuadrupedEnv(QuadrupedConfig(), num_envs=B)
    state, obs = env.reset(jax.random.key(0))
    actions = jnp.zeros((B, 12))

    ns_ref, obs_ref, rew_ref, done_ref, _ = jax.jit(env.step)(state, actions)

    mesh = sh.make_mesh(n_env=8, n_model=1)
    state_sh = sh.shard_env_state(mesh, state)
    with jax.set_mesh(mesh):
        ns, obs_s, rew_s, done_s, _ = jax.jit(env.step)(state_sh, actions)
    np.testing.assert_allclose(np.asarray(rew_s), np.asarray(rew_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(obs_s), np.asarray(obs_ref),
                               atol=1e-4)


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape[0] == 256
