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


@pytest.fixture(scope="module", autouse=True)
def _fresh_compiler_state():
    # This module runs LAST in the suite, after hundreds of XLA:CPU
    # compiles; with the accumulated executable cache the GRU-actor
    # rollout compile segfaults inside backend_compile (reproduced
    # twice at the same test, while the same module passes standalone).
    # Dropping the in-process caches before the module compiles afresh
    # avoids the crashed compiler state.
    jax.clear_caches()
    yield


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
    bc_state, losses = bc.train(total_steps=200, distill_epochs=2,
                                final_epochs=1, eval_every=10**9)
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


def test_adaptive_dr_controller_logic():
    from paddlerobotics_tpu.core.config import RandomConfig
    from paddlerobotics_tpu.train.etg_rl import AdaptiveDRController

    rcfg = RandomConfig(random_dynamics=True, dynamics_scale=1.0,
                        dr_scale_start=0.3, dr_adaptive=True,
                        dr_success_lo=0.3, dr_success_hi=0.5,
                        dr_step_up=0.1, dr_step_down=0.05)
    adr = AdaptiveDRController(rcfg, ema_decay=0.0)  # no smoothing
    # sustained success → scale grows toward the full range and clamps
    for _ in range(10):
        s = adr.update(0.9)
    assert s == pytest.approx(1.0)
    # sustained failure → backs off, clamped at the floor
    for _ in range(20):
        s = adr.update(0.0)
    assert s == pytest.approx(0.3)
    # mid-band success holds the frontier
    s0 = adr.update(0.4)
    assert adr.update(0.4) == pytest.approx(s0)
    # EMA actually smooths: one bad chunk after many good ones does not
    # immediately shrink
    adr2 = AdaptiveDRController(rcfg, ema_decay=0.9)
    for _ in range(30):
        adr2.update(0.9)
    grown = adr2.scale
    adr2.update(0.0)
    assert adr2.scale >= grown  # EMA still above lo → no step down


def test_adaptive_dr_in_trainer(tiny_cfg, tmp_path):
    from paddlerobotics_tpu.core.config import RandomConfig

    cfg = dataclasses.replace(
        tiny_cfg,
        random=RandomConfig(random_dynamics=True, dynamics_scale=1.0,
                            dr_scale_start=0.25, dr_adaptive=True,
                            dr_success_lo=0.0, dr_success_hi=-1.0,
                            dr_step_up=0.05),
        es=ESConfig(popsize=4, es_every_steps=10**12),
    )
    trainer = ETGRLTrainer(cfg, num_envs=8, outdir=str(tmp_path))
    trainer.train(max_steps=400, chunk_steps=10, checkpoint=False)
    # success_hi = -1 → every chunk grows the scale; the log must show a
    # rising dr_scale starting from dr_scale_start
    import json
    scales = [json.loads(l)["value"]
              for l in open(os.path.join(str(tmp_path), "metrics.jsonl"))
              if json.loads(l)["tag"] == "train/dr_scale"]
    assert len(scales) >= 3
    assert scales[0] == pytest.approx(0.30)   # start + one step
    assert all(b >= a for a, b in zip(scales, scales[1:]))
    assert scales[-1] > scales[0]


def test_warmup_gait_mix(tiny_cfg, tmp_path):
    """During the cold (pre-warmup) phase, warmup_gait_frac of the envs
    roll the near-zero on-gait residual (small noise) while the rest
    explore uniformly — so early replay contains walking transitions
    (SACConfig.warmup_gait_frac rationale)."""
    cfg = dataclasses.replace(
        tiny_cfg, sac=dataclasses.replace(tiny_cfg.sac, warmup_steps=10_000,
                                          warmup_gait_frac=0.5))
    trainer = ETGRLTrainer(cfg, num_envs=8, outdir=str(tmp_path))
    carry, _ = trainer.train(max_steps=160, chunk_steps=10,
                             checkpoint=False)
    n = int(carry.buffer.size)
    act = np.asarray(carry.buffer.act[:n]).reshape(-1, 8,
                                                   trainer.env.action_dim)
    gait, rand = act[:, :4], act[:, 4:]
    assert np.abs(gait).max() < 0.3, np.abs(gait).max()
    assert np.abs(rand).mean() > 0.3, np.abs(rand).mean()
