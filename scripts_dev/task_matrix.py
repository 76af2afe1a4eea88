"""Nine-task training matrix (reference README: 'Well-trained ETG and
neural network model in nine tasks', nine_block.gif).

Trains every terrain task mode with the DEFAULT reward weights and the
wall-clock-optimal schedule (B=4096, K=4, ES on), 20M env steps each,
and records the final train velx / success. Writes
/tmp/task_matrix/summary.json; docs/task_matrix.md is written from it.
"""

import dataclasses
import json
import os
import time
import traceback

from paddlerobotics_tpu.core.config import (ESConfig, QuadrupedConfig,
                                            SACConfig, TaskConfig,
                                            TrainConfig)
from paddlerobotics_tpu.sim.terrain import TASK_MODES
from paddlerobotics_tpu.train.etg_rl import ETGRLTrainer

B = 4096
BUDGET = 20_000_000


def run(mode: str, B: int = B, updates_per_step: int = 4,
        suffix: str = ""):
    task_kw = dict(task_mode=mode)
    if mode == "balance_beam":
        # wider plank for the default stance (docs/task_matrix.md)
        task_kw["beam_width"] = 0.4
    cfg = QuadrupedConfig(
        sim=dataclasses.replace(QuadrupedConfig().sim, use_pallas=True),
        sac=SACConfig(warmup_steps=200_000),
        # ES at the wall-ratio-preserving cadence (400*B, see
        # docs/update_schedule.md addendum) so 10 tasks fit one sweep
        es=ESConfig(es_every_steps=400 * B),
        task=TaskConfig(**task_kw),
        train=TrainConfig(num_envs=B, eval_every_steps=10_000_000,
                          e_step=400, eval_episode_len=400),
    )
    outdir = f"/tmp/task_matrix/{mode}{suffix}"
    os.makedirs(outdir, exist_ok=True)
    tr = ETGRLTrainer(cfg, num_envs=B, outdir=outdir,
                      updates_per_step=updates_per_step)
    t0 = time.time()
    tr.train(max_steps=BUDGET, chunk_steps=50, checkpoint=False)
    wall = time.time() - t0

    velx, succ = [], []
    for line in open(f"{outdir}/metrics.jsonl"):
        d = json.loads(line)
        if d["tag"] == "train/mean_velx":
            velx.append(d["value"])
        elif d["tag"] == "train/mean_success":
            succ.append(d["value"])
    tail = lambda xs: round(sum(xs[-8:]) / max(len(xs[-8:]), 1), 3)
    return {"task": mode + suffix, "wall_s": round(wall, 1),
            "final_velx": tail(velx), "final_success": tail(succ),
            "peak_velx": round(max(velx), 3)}


def main():
    os.makedirs("/tmp/task_matrix", exist_ok=True)
    results = []
    for mode in TASK_MODES:
        print(f"=== {mode} ===", flush=True)
        try:
            r = run(mode)
        except Exception:
            traceback.print_exc()
            r = {"task": mode, "error": traceback.format_exc()[-300:]}
        print(json.dumps(r), flush=True)
        results.append(r)
        with open("/tmp/task_matrix/summary.json", "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
