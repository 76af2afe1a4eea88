"""Long full-range DR run: dynamic_vec + curriculum, extended hold at
scale 1.0 (dr_study.py follow-up). Writes /tmp/dr_study/dynvec_long/."""
import dataclasses, json, time
import jax, jax.numpy as jnp
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
                        dr_scale_start=0.3, dr_curriculum_steps=60_000_000),
    task=TaskConfig(task_mode="ground"),
    train=TrainConfig(num_envs=B, eval_every_steps=50_000_000,
                      e_step=400, eval_episode_len=400),
)
tr = ETGRLTrainer(cfg, num_envs=B, outdir="/tmp/dr_study/dynvec_long",
                  updates_per_step=4)
t0 = time.time()
tr.train(max_steps=240_000_000, chunk_steps=50, checkpoint=False)
print("wall", round(time.time() - t0, 1))
