"""Bisect arms for the stairs+DR stall (round-3 follow-up).

At B=4096/K=4 + stairs seed, the no-DR hardening run reaches 0.6 train
success by 40M (ES on), but mild DR (fixed scale 0.2, near-nominal
draws after the midpoint fix) stalls at 0.16 by 120M (ES off). These
arms separate the three differences — ES phase, DR draws, dynamic_vec
observation — one axis at a time at the same fast schedule.

  nodr_noes   no DR, ES off        (is ES load-bearing without DR?)
  dr_es       DR 0.2, ES on        (is ES safe/load-bearing under mild DR?)
  dr_nodyn    DR 0.2, ES off, no dynamic_vec (is the 48-d echo the problem?)
  nodr_es     no DR, ES on         (control = hardening-run config)

usage: python scripts_dev/stairs_dr_arms.py <arm> [budget] [seed]
"""

import dataclasses
import json
import sys
import time

import jax.numpy as jnp

from paddlerobotics_tpu.core.config import (ESConfig, QuadrupedConfig,
                                            RandomConfig, SACConfig,
                                            SensorConfig, TaskConfig,
                                            TrainConfig)
from paddlerobotics_tpu.etg import seeds as etg_seeds
from paddlerobotics_tpu.train.etg_rl import ETGRLTrainer

B = 4096
ARM = sys.argv[1]
BUDGET = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000_000
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 0

es_on = ESConfig(es_every_steps=400 * B)
es_off = ESConfig(es_every_steps=10 ** 15)
# fixed mild DR: no curriculum/adaptive, so the constant
# dynamics_scale IS the draw scale (see train() dr_curr logic)
dr_on = RandomConfig(random_dynamics=True, dynamics_scale=0.2)
dr_off = RandomConfig()

ARMS = {
    "nodr_noes": dict(es=es_off, random=dr_off, dyn=True),
    "dr_es": dict(es=es_on, random=dr_on, dyn=True),
    "dr_nodyn": dict(es=es_off, random=dr_on, dyn=False),
    "nodr_es": dict(es=es_on, random=dr_off, dyn=True),
}
a = ARMS[ARM]

cfg = QuadrupedConfig(
    sim=dataclasses.replace(QuadrupedConfig().sim, use_pallas=True),
    sac=SACConfig(warmup_steps=200_000),
    es=a["es"],
    sensors=SensorConfig(dynamic_vec=a["dyn"]),
    random=a["random"],
    task=TaskConfig(task_mode="stairstair"),
    train=TrainConfig(num_envs=B, eval_every_steps=10 ** 12,
                      e_step=400, eval_episode_len=400),
)

OUT = f"/tmp/dr_study/arms_{ARM}_s{SEED}_{BUDGET // 10**6}M"
tr = ETGRLTrainer(cfg, num_envs=B, outdir=OUT, updates_per_step=4)
p = etg_seeds.load_seed_param("stairstair")
t0 = time.time()
tr.train(max_steps=BUDGET, chunk_steps=50, seed=SEED, checkpoint=False,
         init_etg_param=None if p is None else jnp.asarray(p))
wall = time.time() - t0

velx, succ = [], []
for line in open(f"{OUT}/metrics.jsonl"):
    d = json.loads(line)
    if d["tag"] == "train/mean_velx":
        velx.append(d["value"])
    elif d["tag"] == "train/mean_success":
        succ.append(d["value"])
tail = lambda xs: round(sum(xs[-8:]) / max(len(xs[-8:]), 1), 3)
print(json.dumps({
    "arm": ARM, "budget": BUDGET, "seed": SEED,
    "wall_s": round(wall, 1),
    "final_velx": tail(velx), "final_success": tail(succ),
    "succ_trace": [round(s, 3) for s in succ[:: max(len(succ) // 20, 1)]],
}), flush=True)
