"""Adaptive-DR validation: success-gated curriculum + dynamic_vec,
120M steps (compare vs dr_study.md curr_dynvec: linear anneal, velx
0.36 / success 0.37 at the same budget)."""
import dataclasses, json, time
import jax
from paddlerobotics_tpu.core.config import (ESConfig, QuadrupedConfig,
                                            RandomConfig, SACConfig,
                                            SensorConfig, TaskConfig,
                                            TrainConfig)
from paddlerobotics_tpu.train.etg_rl import ETGRLTrainer

B = 4096
cfg = QuadrupedConfig(
    sim=dataclasses.replace(QuadrupedConfig().sim, use_pallas=True),
    sac=SACConfig(warmup_steps=200_000),
    es=ESConfig(es_every_steps=10**15),
    sensors=SensorConfig(dynamic_vec=True),
    random=RandomConfig(random_dynamics=True, dynamics_scale=1.0,
                        dr_scale_start=0.3, dr_adaptive=True,
                        dr_success_lo=0.15, dr_success_hi=0.35),
    task=TaskConfig(task_mode="ground"),
    train=TrainConfig(num_envs=B, eval_every_steps=60_000_000,
                      e_step=400, eval_episode_len=400),
)
tr = ETGRLTrainer(cfg, num_envs=B, outdir="/tmp/dr_study/adaptive2",
                  updates_per_step=4)
t0 = time.time()
tr.train(max_steps=120_000_000, chunk_steps=50, checkpoint=False)
print("wall", round(time.time() - t0, 1))
