"""Dev validation: does the full ETG-RL recipe improve return on TPU?

Runs ~25 min of real training at 2048 envs with the pallas megakernel,
then prints first-vs-last eval rewards and velx trend.
"""

import dataclasses
import json
import time

from paddlerobotics_tpu.core.config import (ESConfig, QuadrupedConfig,
                                            SACConfig, SimConfig,
                                            TrainConfig)
from paddlerobotics_tpu.train.etg_rl import ETGRLTrainer

B = 2048
cfg = QuadrupedConfig(
    sim=SimConfig(use_pallas=True),
    sac=SACConfig(warmup_steps=200_000, batch_size=1024),
    es=ESConfig(popsize=32, es_every_steps=20_000_000, es_train_steps=3,
                es_episode_len=400),
    train=TrainConfig(num_envs=B, eval_every_steps=4_000_000,
                      e_step=400, eval_episode_len=400),
)

t0 = time.time()
tr = ETGRLTrainer(cfg, num_envs=B, outdir="/tmp/learn_check",
                  updates_per_step=4)
carry, _ = tr.train(max_steps=60_000_000, chunk_steps=50, checkpoint=False)
print(f"wall: {time.time()-t0:.0f}s")

evals = []
for line in open("/tmp/learn_check/metrics.jsonl"):
    d = json.loads(line)
    if d["tag"] == "eval/episode_reward":
        evals.append((d["step"], d["value"]))
velx = [json.loads(l) for l in open("/tmp/learn_check/metrics.jsonl")
        if json.loads(l)["tag"] == "train/mean_velx"]
print("evals:", [(s, round(v, 1)) for s, v in evals])
print("velx first/last:", round(velx[0]["value"], 3),
      round(velx[-1]["value"], 3))
