"""Bisect WHY stairs + full-range DR flatlines (VERDICT r2 next #3).

Plain stairstair at B=4096/K=4 + seed reaches success 0.886 in 20M
steps, but the combined stairs_dr_run.py recipe (B=1024/K=16/LN/seed +
dynamic_vec + adaptive DR from the 0.2 floor) sat at success 0.169
after 120M. This isolates the ingredient that breaks learning: each
arm adds ONE ingredient on top of the known-good stairstair schedule.

  base    B=1024/K=16/LN/seed, no DR, no dynamic_vec   (control)
  dvec    + dynamic_vec observation (48-d zeros when DR off)
  dr02    + random_dynamics at FIXED scale 0.2 (no curriculum), dvec on
  dr02nv  + random_dynamics fixed 0.2, dynamic_vec OFF

Usage: python scripts_dev/stairs_bisect.py <arm> [budget] [seed]
Writes /tmp/stairs_bisect/<arm>/metrics.jsonl + one summary JSON line.
"""

import dataclasses
import json
import os
import sys
import time

import jax.numpy as jnp

from paddlerobotics_tpu.core.config import (ESConfig, QuadrupedConfig,
                                            RandomConfig, SACConfig,
                                            SensorConfig, TaskConfig,
                                            TrainConfig)
from paddlerobotics_tpu.etg import seeds as etg_seeds
from paddlerobotics_tpu.train.etg_rl import ETGRLTrainer

ARM = sys.argv[1]
BUDGET = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000_000
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 0
B = 1024

dr_on = ARM in ("dr02", "dr02nv")
dvec = ARM in ("dvec", "dr02")

cfg = QuadrupedConfig(
    sim=dataclasses.replace(QuadrupedConfig().sim, use_pallas=True),
    sac=SACConfig(warmup_steps=200_000, ln_critic=True),
    es=ESConfig(es_every_steps=10 ** 15),
    sensors=SensorConfig(dynamic_vec=dvec),
    random=RandomConfig(random_dynamics=dr_on, dynamics_scale=0.2,
                        dr_curriculum_steps=0, dr_adaptive=False),
    task=TaskConfig(task_mode="stairstair"),
    train=TrainConfig(num_envs=B, eval_every_steps=10 ** 12,
                      e_step=400, eval_episode_len=400),
)

outdir = f"/tmp/stairs_bisect/{ARM}_s{SEED}_{BUDGET // 10**6}M"
os.makedirs(outdir, exist_ok=True)
tr = ETGRLTrainer(cfg, num_envs=B, outdir=outdir, updates_per_step=16)
p = etg_seeds.load_seed_param("stairstair")
t0 = time.time()
tr.train(max_steps=BUDGET, chunk_steps=50, seed=SEED, checkpoint=False,
         init_etg_param=None if p is None else jnp.asarray(p))
wall = time.time() - t0

velx, succ = [], []
for line in open(f"{outdir}/metrics.jsonl"):
    d = json.loads(line)
    if d["tag"] == "train/mean_velx":
        velx.append((d["step"], round(d["value"], 3)))
    elif d["tag"] == "train/mean_success":
        succ.append(round(d["value"], 3))
tail = lambda xs: round(sum(xs[-8:]) / max(len(xs[-8:]), 1), 3)
print(json.dumps({
    "arm": ARM, "budget": BUDGET, "wall_s": round(wall, 1),
    "final_velx": tail([v for _, v in velx]),
    "final_success": tail(succ),
    "peak_velx": max(v for _, v in velx) if velx else 0.0,
    "peak_success": max(succ) if succ else 0.0,
    "succ_trace": succ[:: max(len(succ) // 20, 1)],
}), flush=True)
