"""Uphill-slope entropy-anneal arm (round-4: settle the train-trace
wander under the high-entropy sample-efficiency schedule).

Round-3 finding (docs/task_matrix.md): up_slope trains strong
deterministic policies (eval 1.20 m/s / 0.99) but the stochastic train
trace wanders (velx 0.34-0.39) — exploration noise on an incline. This
arm runs the SAME registered preset with SAC alpha linearly annealed
0.2 → 0.05 over the budget; the comparison row is the existing matrix
entry.

Usage: python scripts_dev/ups_anneal.py [budget=20000000]
"""

import json
import sys

from paddlerobotics_tpu.cli import eval_matrix

budget = 20_000_000
task = "up_slope"
for a in sys.argv[1:]:
    if a.startswith("budget="):
        budget = int(a.split("=", 1)[1])
    elif a.startswith("task="):
        task = a.split("=", 1)[1]

row = eval_matrix.run_task(
    task, f"/tmp/{task}_anneal", train=True, budget=budget,
    eval_steps=600,
    overrides=dict(alpha_anneal_steps=budget))
print(json.dumps(row), flush=True)
