import dataclasses
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerobotics_tpu.core.config import (ESConfig, QuadrupedConfig,
                                            SACConfig, TrainConfig)
from paddlerobotics_tpu.train.etg_rl import ETGRLTrainer


@pytest.fixture(scope="module")
def tiny_cfg():
    return QuadrupedConfig(
        sac=SACConfig(memory_size=5000, warmup_steps=100, batch_size=64),
        es=ESConfig(popsize=4, es_every_steps=800, es_train_steps=1,
                    es_episode_len=15),
        train=TrainConfig(eval_every_steps=400, e_step=50,
                          eval_episode_len=15, num_envs=8),
    )


def test_dual_loop_runs(tiny_cfg, tmp_path):
    trainer = ETGRLTrainer(tiny_cfg, num_envs=8, outdir=str(tmp_path))
    carry, (w, b, param) = trainer.train(max_steps=1700, chunk_steps=10,
                                         checkpoint=True)
    # all phases exercised: warmup, SAC learn, eval, ES
    log = open(os.path.join(str(tmp_path), "metrics.jsonl")).read()
    assert "train/episode_reward" in log
    assert "eval/episode_reward" in log
    assert "ES/episode_reward" in log
    assert w.shape == (3, tiny_cfg.etg.H)
    assert param.shape == (12,)
    # checkpoint written
    assert any(n.startswith("itr_") for n in os.listdir(str(tmp_path)))
    # replay buffer filled
    assert int(carry.buffer.size) > 1000
    # losses are finite
    q = np.asarray(carry.sac_state.critic_params["params"]["Dense_0"]["kernel"])
    assert np.all(np.isfinite(q))


def test_es_eval_population_assignment(tiny_cfg):
    trainer = ETGRLTrainer(tiny_cfg, num_envs=8, outdir="/tmp/etg_test")
    sols = jnp.zeros((4, 12))
    ws, bs = trainer.fit_etg_population(sols)
    assert ws.shape == (4, 3, tiny_cfg.etg.H)
    sac_state = trainer.sac.init(jax.random.key(0))
    fitness, ep_len, _ = trainer.es_eval(sac_state.actor_params, ws, bs,
                                      jax.random.key(1), 10, 4)
    assert fitness.shape == (4,)
    # identical candidates → identical fitness
    np.testing.assert_allclose(np.asarray(fitness),
                               np.asarray(fitness)[0] * np.ones(4), rtol=1e-4)


def test_bc_trainer_smoke(tiny_cfg):
    from paddlerobotics_tpu.algos.sac import SAC
    from paddlerobotics_tpu.train.bc_train import BCTrainer

    expert = SAC(49, 12, tiny_cfg.sac)
    expert_state = expert.init(jax.random.key(0))
    bc = BCTrainer(tiny_cfg, expert, expert_state, num_envs=4,
                   outdir="/tmp/bc_test")
    bc_state, losses = bc.train(total_steps=200, collect_chunk=8,
                                distill_epochs=2)
    assert np.isfinite(float(losses["actor_loss"]))
    assert np.isfinite(float(losses["critic_loss"]))
    # student predicts from the truncated view
    act = bc.bc.predict(bc_state.actor_params, jnp.zeros((2, 46)))
    assert act.shape == (2, 12)


def test_solver_selection():
    import dataclasses
    from paddlerobotics_tpu.algos import es as es_mod

    for name, cls in (("open_es", es_mod.OpenES), ("cma_es", es_mod.CMAES),
                      ("simple_es", es_mod.SimpleES)):
        cfg = QuadrupedConfig(es=ESConfig(solver=name, popsize=4))
        tr = ETGRLTrainer(cfg, num_envs=4, outdir="/tmp/solver_test")
        assert isinstance(tr.solver, cls)


def test_checkpoint_restore_roundtrip(tiny_cfg, tmp_path):
    from paddlerobotics_tpu.train import checkpoints

    t1 = ETGRLTrainer(tiny_cfg, num_envs=8, outdir=str(tmp_path / "a"))
    carry, (w, b, param) = t1.train(max_steps=500, chunk_steps=10,
                                    checkpoint=False)
    target = checkpoints.save(str(tmp_path / "a"), {
        "sac": carry.sac_state._asdict(),
        "etg_w": w, "etg_b": b, "etg_param": param}, 500)

    t2 = ETGRLTrainer(tiny_cfg, num_envs=8, outdir=str(tmp_path / "b"))
    t2.restore(target)
    carry2, _ = t2.train(max_steps=200, chunk_steps=10, checkpoint=False)
    # restored weights were the starting point: actor params differ from a
    # fresh init but training continued without error
    a_restored = jax.tree.leaves(carry2.sac_state.actor_params)[0]
    fresh = t2.sac.init(jax.random.key(99))
    a_fresh = jax.tree.leaves(fresh.actor_params)[0]
    assert a_restored.shape == a_fresh.shape
    assert np.isfinite(np.asarray(a_restored)).all()
    assert checkpoints.latest_step(str(tmp_path / "a")) == 500


@pytest.mark.parametrize("mode", ["stack", "GRU"])
def test_rnn_mode_wired(tiny_cfg, tmp_path, mode):
    """--RNN_mode must change the policy input, not be silently ignored
    (SENSOR_MODE['RNN'], train.py:273-277)."""
    from paddlerobotics_tpu.core.config import SensorConfig

    cfg = dataclasses.replace(
        tiny_cfg, sensors=SensorConfig(rnn_time_steps=3,
                                       rnn_time_interval=1, rnn_mode=mode))
    trainer = ETGRLTrainer(cfg, num_envs=8, outdir=str(tmp_path / mode))
    assert trainer.env.obs_dim == 49 * 4
    assert trainer.sac.obs_dim == 49 * 4
    if mode == "GRU":
        from paddlerobotics_tpu.algos.networks import GRUActor
        assert isinstance(trainer.sac.actor, GRUActor)
    carry, _ = trainer.train(max_steps=240, chunk_steps=10,
                             checkpoint=False)
    assert int(carry.buffer.size) > 0
    q = np.asarray(jax.tree.leaves(carry.sac_state.actor_params)[0])
    assert np.all(np.isfinite(q))


def test_rnn_mode_unknown_raises(tiny_cfg):
    from paddlerobotics_tpu.core.config import SensorConfig

    cfg = dataclasses.replace(
        tiny_cfg, sensors=SensorConfig(rnn_time_steps=3, rnn_mode="bogus"))
    with pytest.raises(ValueError):
        ETGRLTrainer(cfg, num_envs=8, outdir="/tmp/etg_bogus")
