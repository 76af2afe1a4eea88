"""Headline behavioral validation: DEFAULT reference recipe learns
stairstair (reward_calibration.md). Runs the unmodified CLI defaults
for 40M env steps and summarizes final velx/success."""

import json
import sys

from paddlerobotics_tpu.cli import train_quadruped

OUT = "/tmp/stairs_check"

train_quadruped.main([
    "--task_mode", "stairstair", "--max_steps", "40000000",
    "--outdir", OUT, "--suffix", "v"])

velx, succ = [], []
for line in open(f"{OUT}/v/metrics.jsonl"):
    d = json.loads(line)
    if d["tag"] == "train/mean_velx":
        velx.append(d["value"])
    elif d["tag"] == "train/mean_success":
        succ.append(d["value"])
tail = lambda xs: round(sum(xs[-8:]) / max(len(xs[-8:]), 1), 3)
print(json.dumps({"final_velx": tail(velx), "final_success": tail(succ),
                  "peak_velx": round(max(velx), 3)}))
