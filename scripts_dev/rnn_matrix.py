"""RNN sensor-mode task-matrix rows (round-5).

The reference's sim2real robustness story trains policies on temporal
observation history (SENSOR_MODE['RNN'] = {time_steps, time_interval,
mode: stack|GRU}, train.py:273-277). The wiring has existed since
round 2 (algos/networks.GRUActor, envs/wrappers.ObsHistoryWrapper) but
no policy was ever TRAINED through it. This script trains the
reference's two history modes on a DR-heavy task and records the same
deterministic-eval row as docs/task_matrix.md, next to the feedforward
row, with the full reference DR range active (random_dynamics, the
implicit claim history is supposed to help with).

    python scripts_dev/rnn_matrix.py [--task up_slope] [--budget 20000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", type=str, default="up_slope")
    p.add_argument("--budget", type=int, default=20_000_000)
    p.add_argument("--root", type=str, default="/tmp/rnn_matrix")
    p.add_argument("--arms", type=str, default="ff,stack,GRU")
    p.add_argument("--time_steps", type=int, default=5,
                   help="history length (reference --timesteps 5)")
    args = p.parse_args()

    from paddlerobotics_tpu.cli.eval_matrix import run_task

    os.makedirs(args.root, exist_ok=True)
    rows = []
    for arm in args.arms.split(","):
        overrides = {"random_dynamics": 1}
        if arm != "ff":
            overrides.update(rnn_mode=arm, rnn_time_steps=args.time_steps)
        print(f"=== {args.task} / {arm} ===", flush=True)
        try:
            r = run_task(args.task, os.path.join(args.root, arm),
                         train=True, budget=args.budget, eval_steps=600,
                         overrides=overrides)
            r["arm"] = arm
        except Exception as e:      # noqa: BLE001 — record and continue
            import traceback
            traceback.print_exc()
            r = {"arm": arm, "error": str(e)[-300:]}
        print(json.dumps(r), flush=True)
        rows.append(r)
        with open(os.path.join(args.root, "summary.json"), "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
