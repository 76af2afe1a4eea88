import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerobotics_tpu.algos import replay
from paddlerobotics_tpu.algos.sac import SAC
from paddlerobotics_tpu.core.config import SACConfig


@pytest.fixture(scope="module")
def sac():
    return SAC(obs_dim=8, action_dim=3, cfg=SACConfig())


def test_init_and_predict(sac):
    state = sac.init(jax.random.key(0))
    obs = jnp.ones((5, 8))
    act = sac.predict(state.actor_params, obs)
    assert act.shape == (5, 3)
    assert float(jnp.max(jnp.abs(act))) <= 1.0


def test_sample_logprob_formula(sac):
    """log_prob must equal the tanh-Gaussian density (sac.py:65-75)."""
    state = sac.init(jax.random.key(0))
    obs = jax.random.normal(jax.random.key(1), (64, 8))
    act, logp = sac.sample(state.actor_params, obs, jax.random.key(2))
    assert act.shape == (64, 3)
    assert logp.shape == (64, 1)
    # compare against a numpy recomputation
    mean, log_std = sac.actor.apply(state.actor_params, obs)
    x_t = jnp.arctanh(jnp.clip(act, -1 + 1e-6, 1 - 1e-6))
    mean, log_std, x_t, act_n = map(np.asarray, (mean, log_std, x_t, act))
    std = np.exp(log_std)
    lp = -0.5 * ((x_t - mean) / std) ** 2 - log_std - 0.5 * np.log(2 * np.pi)
    lp = lp - np.log(1 - act_n ** 2 + 1e-6)
    np.testing.assert_allclose(np.asarray(logp)[:, 0], lp.sum(-1), atol=1e-2)


def test_learn_reduces_critic_loss(sac):
    state = sac.init(jax.random.key(0))
    rng = jax.random.key(3)
    B = 128
    batch = {
        "obs": jax.random.normal(jax.random.key(4), (B, 8)),
        "act": jnp.tanh(jax.random.normal(jax.random.key(5), (B, 3))),
        "rew": jnp.ones((B, 1)),
        "next_obs": jax.random.normal(jax.random.key(6), (B, 8)),
        "terminal": jnp.ones((B, 1)),
    }
    learn = jax.jit(lambda s, r: sac.learn(s, batch, r))
    first = None
    for i in range(60):
        rng, k = jax.random.split(rng)
        state, info = learn(state, k)
        if first is None:
            first = float(info["critic_loss"])
    last = float(info["critic_loss"])
    assert last < first, (first, last)


def test_target_sync_polyak(sac):
    state = sac.init(jax.random.key(0))
    batch = {
        "obs": jnp.zeros((4, 8)), "act": jnp.zeros((4, 3)),
        "rew": jnp.zeros((4, 1)), "next_obs": jnp.zeros((4, 8)),
        "terminal": jnp.ones((4, 1)),
    }
    state2, _ = sac.learn(state, batch, jax.random.key(1))
    # target must move toward critic by tau
    t0 = jax.tree.leaves(state.target_critic_params)[0]
    c1 = jax.tree.leaves(state2.critic_params)[0]
    t1 = jax.tree.leaves(state2.target_critic_params)[0]
    expect = (1 - sac.cfg.tau) * t0 + sac.cfg.tau * c1
    np.testing.assert_allclose(np.asarray(t1), np.asarray(expect), atol=1e-6)


def test_replay_roundtrip():
    buf = replay.create(100, 8, 3)
    obs = jnp.arange(10 * 8, dtype=jnp.float32).reshape(10, 8)
    act = jnp.ones((10, 3))
    buf = replay.add_batch(buf, obs, act, jnp.ones(10), obs + 1, jnp.ones(10))
    assert int(buf.size) == 10
    batch = replay.sample(buf, jax.random.key(0), 4)
    assert batch["obs"].shape == (4, 8)
    # sampled rows must be rows we inserted
    first_col = np.asarray(batch["obs"][:, 0])
    assert np.all(first_col % 8 == 0)


def test_replay_ring_wrap():
    buf = replay.create(16, 2, 1)
    for i in range(5):
        obs = jnp.full((6, 2), float(i))
        buf = replay.add_batch(buf, obs, jnp.zeros((6, 1)), jnp.zeros(6),
                               obs, jnp.ones(6))
    assert int(buf.size) == 16
    assert int(buf.ptr) == (5 * 6) % 16


def test_auto_alpha():
    from paddlerobotics_tpu.core.config import SACConfig

    s = SAC(obs_dim=8, action_dim=3, cfg=SACConfig(auto_alpha=True))
    state = s.init(jax.random.key(0))
    la0 = float(state.log_alpha)
    batch = {
        "obs": jax.random.normal(jax.random.key(1), (64, 8)),
        "act": jnp.tanh(jax.random.normal(jax.random.key(2), (64, 3))),
        "rew": jnp.ones((64, 1)),
        "next_obs": jax.random.normal(jax.random.key(3), (64, 8)),
        "terminal": jnp.ones((64, 1)),
    }
    for i in range(10):
        state, info = s.learn(state, batch, jax.random.key(i))
    assert float(state.log_alpha) != la0
    assert np.isfinite(float(state.log_alpha))


def test_x_noise_reset():
    from paddlerobotics_tpu.core.config import QuadrupedConfig, TrainConfig
    from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv

    cfg = QuadrupedConfig(train=TrainConfig(x_noise=True))
    env = BatchedQuadrupedEnv(cfg, num_envs=8)
    state, obs = env.reset(jax.random.key(0))
    xy = np.asarray(state.robot.s.pos[:2])
    assert xy.std() > 1e-3   # jittered
    assert np.abs(xy).max() < 0.1


def test_ln_critic_learns_and_param_tree_superset():
    """ln_critic adds LN leaves without renaming the Dense tree (round-2
    checkpoint compatibility for the default config)."""
    s0 = SAC(obs_dim=8, action_dim=3, cfg=SACConfig())
    s1 = SAC(obs_dim=8, action_dim=3, cfg=SACConfig(ln_critic=True))
    p0 = s0.init(jax.random.key(0)).critic_params["params"]
    p1 = s1.init(jax.random.key(0)).critic_params["params"]
    assert set(p0).issubset(set(p1)), (set(p0), set(p1))
    assert any(k.startswith("LN_") for k in p1)
    # learning still runs and stays finite
    state = s1.init(jax.random.key(0))
    batch = {
        "obs": jax.random.normal(jax.random.key(1), (64, 8)),
        "act": jnp.tanh(jax.random.normal(jax.random.key(2), (64, 3))),
        "rew": jnp.ones((64, 1)),
        "next_obs": jax.random.normal(jax.random.key(3), (64, 8)),
        "terminal": jnp.ones((64, 1)),
    }
    for i in range(5):
        state, info = s1.learn(state, batch, jax.random.key(i))
    assert np.isfinite(float(info["critic_loss"]))


def test_reset_critic_keeps_actor():
    s = SAC(obs_dim=8, action_dim=3, cfg=SACConfig())
    state = s.init(jax.random.key(0))
    batch = {
        "obs": jax.random.normal(jax.random.key(1), (64, 8)),
        "act": jnp.tanh(jax.random.normal(jax.random.key(2), (64, 3))),
        "rew": jnp.ones((64, 1)),
        "next_obs": jax.random.normal(jax.random.key(3), (64, 8)),
        "terminal": jnp.ones((64, 1)),
    }
    for i in range(3):
        state, _ = s.learn(state, batch, jax.random.key(i))
    reset = s.reset_critic(state, jax.random.key(99))
    # actor untouched, critic re-drawn, target == critic, opt state fresh
    a0 = jax.tree.leaves(state.actor_params)[0]
    a1 = jax.tree.leaves(reset.actor_params)[0]
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
    c_old = jax.tree.leaves(state.critic_params)[0]
    c_new = jax.tree.leaves(reset.critic_params)[0]
    assert float(jnp.abs(c_old - c_new).max()) > 1e-6
    t_new = jax.tree.leaves(reset.target_critic_params)[0]
    np.testing.assert_array_equal(np.asarray(c_new), np.asarray(t_new))


def test_fused_critic_apply_matches_module():
    """networks.critic_apply_fused must reproduce Critic.apply exactly
    (same param tree; stacked-matmul fusion is a pure reformulation)."""
    from paddlerobotics_tpu.algos.networks import Critic, critic_apply_fused

    for ln in (False, True):
        crit = Critic(hidden=64, layer_norm=ln)
        params = crit.init(jax.random.key(0), jnp.zeros((1, 8)),
                           jnp.zeros((1, 3)))
        obs = jax.random.normal(jax.random.key(1), (32, 8))
        act = jnp.tanh(jax.random.normal(jax.random.key(2), (32, 3)))
        q1_m, q2_m = crit.apply(params, obs, act)
        q1_f, q2_f = critic_apply_fused(params, obs, act, layer_norm=ln)
        np.testing.assert_allclose(np.asarray(q1_m), np.asarray(q1_f),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(q2_m), np.asarray(q2_f),
                                   rtol=1e-5, atol=1e-5)
        # bf16 path stays close (fp32 accumulate)
        q1_b, q2_b = critic_apply_fused(params, obs, act, layer_norm=ln,
                                        bf16=True)
        np.testing.assert_allclose(np.asarray(q1_m), np.asarray(q1_b),
                                   rtol=0.05, atol=0.05)


def test_sample_many_matches_sample_distribution():
    from paddlerobotics_tpu.algos import replay

    buf = replay.create(128, 4, 2)
    for i in range(4):
        buf = replay.add_batch(
            buf, jnp.full((32, 4), i, jnp.float32),
            jnp.zeros((32, 2)), jnp.zeros(32),
            jnp.full((32, 4), i, jnp.float32), jnp.ones(32))
    many = replay.sample_many(buf, jax.random.key(0), 3, 16)
    assert many["obs"].shape == (3, 16, 4)
    assert many["rew"].shape == (3, 16, 1)
    # every sampled row is a real buffer row (obs == next_obs marker)
    np.testing.assert_array_equal(np.asarray(many["obs"]),
                                  np.asarray(many["next_obs"]))
