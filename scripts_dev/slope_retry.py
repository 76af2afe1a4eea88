"""up_slope/slopeslope retry with the sample-efficiency schedule
(B=1024, K=16 — docs/update_schedule.md) and a slope-feasibility probe."""
import dataclasses, json, os, time, traceback
from paddlerobotics_tpu.core.config import (ESConfig, QuadrupedConfig,
                                            SACConfig, TaskConfig,
                                            TrainConfig)
from paddlerobotics_tpu.train.etg_rl import ETGRLTrainer

B = 1024
BUDGET = 20_000_000

def run(mode):
    cfg = QuadrupedConfig(
        sim=dataclasses.replace(QuadrupedConfig().sim, use_pallas=True),
        sac=SACConfig(warmup_steps=200_000),
        es=ESConfig(es_every_steps=400 * B),
        task=TaskConfig(task_mode=mode),
        train=TrainConfig(num_envs=B, eval_every_steps=10_000_000,
                          e_step=400, eval_episode_len=400),
    )
    outdir = f"/tmp/task_matrix/{mode}_b1024"
    tr = ETGRLTrainer(cfg, num_envs=B, outdir=outdir, updates_per_step=16)
    t0 = time.time()
    tr.train(max_steps=BUDGET, chunk_steps=50, checkpoint=False)
    wall = time.time() - t0
    velx, succ = [], []
    for line in open(f"{outdir}/metrics.jsonl"):
        d = json.loads(line)
        if d["tag"] == "train/mean_velx": velx.append(d["value"])
        elif d["tag"] == "train/mean_success": succ.append(d["value"])
    tail = lambda xs: round(sum(xs[-8:]) / max(len(xs[-8:]), 1), 3)
    return {"task": mode + "_b1024_u16", "wall_s": round(wall, 1),
            "final_velx": tail(velx), "final_success": tail(succ),
            "peak_velx": round(max(velx), 3)}

results = []
for mode in ("up_slope", "slopeslope"):
    print(f"=== {mode} ===", flush=True)
    try:
        r = run(mode)
    except Exception:
        traceback.print_exc(); r = {"task": mode, "error": "see log"}
    print(json.dumps(r), flush=True)
    results.append(r)
    with open("/tmp/task_matrix/retry_summary.json", "w") as f:
        json.dump(results, f, indent=1)
