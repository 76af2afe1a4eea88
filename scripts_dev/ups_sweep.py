"""Update-schedule study (VERDICT round-1 item #2).

The reference does ONE SGD update (batch 256) per SINGLE-env step
(ETGRL/train.py:163-167) — an update:data ratio of 1 update / 1 env
step, i.e. each datum is revisited ~256 times. A batched TPU trainer
takes B env steps per control step, so `updates_per_step` (K) sets the
ratio at K/B updates per env step. This sweep measures return-vs-env-
steps across (B, K) to find the sample-efficiency frontier and a
setting that reproduces reference-like sample efficiency (success at
stairstair within the reference's 1e7-step budget scale).

Writes one metrics dir per config under /tmp/ups_sweep/ and a summary
JSON; docs/update_schedule.md is written from the summary.
"""

import dataclasses
import json
import os
import time
import traceback

from paddlerobotics_tpu.core.config import (ESConfig, QuadrupedConfig,
                                            SACConfig, SimConfig,
                                            TrainConfig)
from paddlerobotics_tpu.train.etg_rl import ETGRLTrainer

BUDGET = 20_000_000          # env steps per config
ES_OFF = 10**15              # isolate the SAC schedule: no ES phases

CONFIGS = [
    # name,        B,    updates/step
    ("b4096_u1", 4096, 1),     # round-1 default (throughput mode)
    ("b4096_u4", 4096, 4),     # round-1 "steady state" README number
    ("b1024_u16", 1024, 16),
    ("b256_u64", 256, 64),
    ("b256_u256", 256, 256),   # reference-exact ratio: 1 update/env step
]


def run(name: str, B: int, ups: int):
    outdir = f"/tmp/ups_sweep/{name}"
    cfg = QuadrupedConfig(
        sim=SimConfig(use_pallas=True),
        sac=SACConfig(warmup_steps=max(10_000, 40 * B)),
        es=ESConfig(es_every_steps=ES_OFF),
        train=TrainConfig(num_envs=B, eval_every_steps=5_000_000,
                          e_step=400, eval_episode_len=400),
    )
    tr = ETGRLTrainer(cfg, num_envs=B, outdir=outdir,
                      updates_per_step=ups)
    t0 = time.time()
    tr.train(max_steps=BUDGET, chunk_steps=50, checkpoint=False)
    wall = time.time() - t0

    velx, succ = [], []
    for line in open(f"{outdir}/metrics.jsonl"):
        d = json.loads(line)
        if d["tag"] == "train/mean_velx":
            velx.append((d["step"], d["value"]))
        elif d["tag"] == "train/mean_success":
            succ.append((d["step"], d["value"]))

    def at(series, step):
        vals = [v for s, v in series if s <= step]
        return round(sum(vals[-8:]) / max(len(vals[-8:]), 1), 3) if vals else None

    def first_cross(series, thr):
        run_len = 0
        for s, v in series:
            run_len = run_len + 1 if v >= thr else 0
            if run_len >= 4:          # sustained, not a blip
                return s
        return None

    return {
        "name": name, "B": B, "updates_per_step": ups,
        "wall_s": round(wall, 1),
        "env_steps_per_s": round(BUDGET / wall, 1),
        "velx@5M": at(velx, 5_000_000),
        "velx@10M": at(velx, 10_000_000),
        "velx@20M": at(velx, BUDGET),
        "success@10M": at(succ, 10_000_000),
        "success@20M": at(succ, BUDGET),
        "steps_to_velx0.3": first_cross(velx, 0.3),
    }


def main():
    os.makedirs("/tmp/ups_sweep", exist_ok=True)
    results = []
    for name, B, ups in CONFIGS:
        print(f"=== {name} (B={B}, K={ups}) ===", flush=True)
        try:
            r = run(name, B, ups)
        except Exception:
            traceback.print_exc()
            r = {"name": name, "B": B, "updates_per_step": ups,
                 "error": traceback.format_exc()[-500:]}
        print(json.dumps(r), flush=True)
        results.append(r)
        with open("/tmp/ups_sweep/summary.json", "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
