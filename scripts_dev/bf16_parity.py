"""bf16 critic-matmul return-parity spot check (round-4 VERDICT item 4).

`SACConfig.bf16_matmul` runs the fused twin-Q matmuls in bfloat16 with
fp32 accumulation. It ships OFF by default until this record exists:
two same-seed stairstair trainings from the registered preset — fp32
vs bf16 — compared on the deterministic 600-step eval protocol
(docs/task_matrix.md columns) plus train_bench throughput for the
speedup side of the trade.

Usage: python scripts_dev/bf16_parity.py [budget=20000000]
"""

import json
import sys

from paddlerobotics_tpu.cli import eval_matrix

budget = 20_000_000
for a in sys.argv[1:]:
    if a.startswith("budget="):
        budget = int(a.split("=", 1)[1])

seeds = [0]
for a in sys.argv[1:]:
    if a.startswith("seeds="):
        seeds = [int(s) for s in a.split("=", 1)[1].split(",")]

for seed in seeds:
    for tag, ov in (("fp32", {}), ("bf16", {"bf16_matmul": True})):
        row = eval_matrix.run_task(
            "stairstair", f"/tmp/bf16_parity/{tag}_s{seed}", train=True,
            budget=budget, eval_steps=600, overrides=ov, seed=seed)
        row["arm"] = tag
        row["seed"] = seed
        print(json.dumps(row), flush=True)
