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


def test_sharded_rollout_chunk():
    """A multi-step sharded rollout (scan) on the 8-device mesh must
    run and keep env-state shards on their devices."""
    from paddlerobotics_tpu.core.config import QuadrupedConfig
    from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv

    B = 16
    env = BatchedQuadrupedEnv(QuadrupedConfig(), num_envs=B)
    mesh = sh.make_mesh(n_env=8, n_model=1)
    state, obs = env.reset(jax.random.key(0))
    state = sh.shard_env_state(mesh, state)

    def rollout(state):
        def body(s, _):
            ns, o, r, d, _ = env.step(s, jnp.zeros((B, 12)))
            return ns, r
        return jax.lax.scan(body, state, None, length=5)

    with jax.set_mesh(mesh):
        final, rews = jax.jit(rollout)(state)
    assert rews.shape == (5, B)
    assert np.all(np.isfinite(np.asarray(rews)))
    # state stays sharded over the env axis
    shard = final.robot.s.q.sharding
    assert "env" in str(shard.spec) or len(shard.device_set) == 8


def test_es_population_sharded_eval():
    """ES population fitness evaluation sharded over the mesh."""
    import dataclasses
    from paddlerobotics_tpu.core.config import ESConfig, QuadrupedConfig, \
        TrainConfig
    from paddlerobotics_tpu.train.etg_rl import ETGRLTrainer

    cfg = QuadrupedConfig(
        es=ESConfig(popsize=8, es_episode_len=5),
        train=TrainConfig(num_envs=16))
    tr = ETGRLTrainer(cfg, num_envs=16, outdir="/tmp/es_shard_test")
    sols = jnp.zeros((8, 12))
    ws, bs = tr.fit_etg_population(sols)
    sac_state = tr.sac.init(jax.random.key(0))
    mesh = sh.make_mesh(n_env=8, n_model=1)
    with jax.set_mesh(mesh):
        fitness, ep_len, _ = tr.es_eval(sac_state.actor_params, ws, bs,
                                        jax.random.key(1), 5, 8)
    assert fitness.shape == (8,)
    assert np.all(np.isfinite(np.asarray(fitness)))


def test_trainer_full_mesh_training():
    """ETGRLTrainer(mesh=...) trains end-to-end with envs/replay sharded
    over an 8-device {'env': 4, 'model': 2} mesh (the CLI's --mesh 4x2
    path — env dp × Megatron tensor-parallel MLPs): one warmup chunk,
    one learn chunk, one ES phase — all under sharded placement."""
    from paddlerobotics_tpu.core.config import (ESConfig, QuadrupedConfig,
                                                SACConfig, TrainConfig)
    from paddlerobotics_tpu.train.etg_rl import ETGRLTrainer

    B = 16
    cfg = QuadrupedConfig(
        sac=SACConfig(warmup_steps=0, batch_size=32, memory_size=2048),
        es=ESConfig(popsize=4, es_every_steps=B * 5, es_train_steps=1,
                    es_episode_len=5, es_num_envs=8),
        train=TrainConfig(num_envs=B, eval_every_steps=10**9, e_step=50))
    mesh = sh.make_mesh(n_env=4, n_model=2)
    tr = ETGRLTrainer(cfg, num_envs=B, outdir="/tmp/mesh_train_test",
                      updates_per_step=1, mesh=mesh)
    carry, (w, b, p) = tr.train(max_steps=B * 10, chunk_steps=5,
                                checkpoint=False)
    # envs actually sharded over the mesh env axis (batch-minor last axis)
    q_shard = carry.env_state.robot.s.q.sharding
    assert q_shard.spec[-1] == "env", q_shard.spec
    # MLP kernels actually tensor-parallel over the model axis
    from jax.sharding import PartitionSpec as P
    specs = [x.sharding.spec
             for x in jax.tree.leaves(carry.sac_state.actor_params)
             if getattr(x, "ndim", 0) == 2]
    assert any(s == P(None, "model") for s in specs), specs
    assert np.all(np.isfinite(np.asarray(carry.obs)))


def test_bc_distillation_on_mesh():
    """BC collect+distill (Q2/Q19 recipe) under env-axis sharding must
    match the unsharded run (the reference runs BCtrain on one host;
    here the expert rollout shards over 'env' like every env surface)."""
    from paddlerobotics_tpu.algos.sac import SAC
    from paddlerobotics_tpu.core.config import QuadrupedConfig, SACConfig
    from paddlerobotics_tpu.train.bc_train import BCTrainer

    B = 16
    cfg = QuadrupedConfig(sac=SACConfig())
    from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv
    obs_dim = BatchedQuadrupedEnv(cfg, 1).obs_dim
    expert = SAC(obs_dim, 12, cfg.sac)
    expert_state = expert.init(jax.random.key(3))
    tr = BCTrainer(cfg, expert, expert_state, num_envs=B,
                   outdir="/tmp/bc_mesh_test")
    state, obs = jax.jit(tr.env.reset)(jax.random.key(0))
    bc_state0 = tr.bc.init(jax.random.key(4))

    _, _, _, (s_ref, e_ref) = tr.collect(bc_state0, state, obs,
                                         jax.random.key(1), 3, False)

    mesh = sh.make_mesh(n_env=8, n_model=1)
    state_sh = sh.shard_env_state(mesh, state)
    with jax.set_mesh(mesh):
        env_state, obs2, rng2, (s_sh, e_sh) = tr.collect(
            bc_state0, state_sh, obs, jax.random.key(1), 3, False)
        # distill consumes the sharded collection through the BC buffer
        from paddlerobotics_tpu.algos import replay
        buf = replay.bc_create(4096, tr.student_obs_dim, tr.env.obs_dim)
        buf = replay.bc_add_batch(buf, s_sh, e_sh)
        bc_state = tr.bc.init(jax.random.key(4))
        bc_state, losses = tr.distill(bc_state, buf, jax.random.key(5), 2)
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_ref),
                               atol=1e-4)
    assert np.isfinite(float(losses["actor_loss"]))


def test_dynamics_id_generation_on_mesh():
    """One dynamics-ID ES generation (Q20, Dynamic_parallel_model.py:
    95-99's xparl fan-out) with the candidate population sharded over
    the env axis."""
    from paddlerobotics_tpu.core.config import QuadrupedConfig
    from paddlerobotics_tpu.train.dynamics_id import DynamicsIdentifier

    P_ = 8
    T = 4
    rng = np.random.RandomState(0)
    gait = rng.randn(T, 12).astype(np.float32) * 0.05
    real_q = rng.randn(T, 12).astype(np.float32) * 0.1
    real_g = rng.randn(T, 3).astype(np.float32) * 0.1
    ident = DynamicsIdentifier(QuadrupedConfig(), gait, real_q, real_g,
                               popsize=P_, outdir="/tmp/dynid_mesh_test")
    sols, _ = ident.solver.ask(
        ident.solver.init(jnp.zeros(sols_dim := 48)), jax.random.key(1))
    fit_ref = ident._fitness(sols, jax.random.key(2))

    mesh = sh.make_mesh(n_env=8, n_model=1)
    from jax.sharding import NamedSharding, PartitionSpec as P
    sols_sh = jax.device_put(sols, NamedSharding(mesh, P("env", None)))
    with jax.set_mesh(mesh):
        fit_sh = ident._fitness(sols_sh, jax.random.key(2))
    np.testing.assert_allclose(np.asarray(fit_sh), np.asarray(fit_ref),
                               rtol=1e-4, atol=1e-5)


def test_checkpoint_roundtrip_of_sharded_carry():
    """Orbax save/restore of a tensor-parallel-sharded SAC state (the
    A3 aux surface under the mesh): restored leaves equal the saved
    ones and re-place onto the mesh."""
    import os
    import tempfile

    from paddlerobotics_tpu.algos.sac import SAC
    from paddlerobotics_tpu.core.config import SACConfig
    from paddlerobotics_tpu.train import checkpoints

    sac = SAC(24, 12, SACConfig())
    state = sac.init(jax.random.key(0))
    mesh = sh.make_mesh(n_env=4, n_model=2)
    sharded = state._replace(
        actor_params=sh.shard_params_tp(mesh, state.actor_params),
        critic_params=sh.shard_params_tp(mesh, state.critic_params))
    with tempfile.TemporaryDirectory() as d:
        checkpoints.save(d, {"sac": sharded._asdict()}, 7)
        restored = checkpoints.restore(
            os.path.join(d, "itr_7"), {"sac": sharded._asdict()})
    a0 = jax.tree.leaves(sharded.actor_params)
    a1 = jax.tree.leaves(restored["sac"]["actor_params"])
    for x, y in zip(a0, a1):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
    # re-placement onto the mesh preserves tensor-parallel specs
    re_sh = sh.shard_params_tp(mesh, restored["sac"]["actor_params"])
    from jax.sharding import PartitionSpec as P
    specs = [x.sharding.spec for x in jax.tree.leaves(re_sh)
             if getattr(x, "ndim", 0) == 2]
    assert any(s == P(None, "model") for s in specs), specs
