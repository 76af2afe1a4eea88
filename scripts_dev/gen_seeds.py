"""Generate the shipped per-task ETG seed library.

Runs cli/pretrain_etg.py's ETGPretrainer per task (~1 min each on one
chip) and writes the npz artifacts into
paddlerobotics_tpu/assets/etg_seeds/ (consumed by etg/seeds.py and the
training CLI's --ETG_path auto). Only tasks where a seed is
load-bearing are generated (docs/task_matrix.md).
"""

import dataclasses
import json
import sys
import time

import numpy as np

from paddlerobotics_tpu.core.config import QuadrupedConfig, TaskConfig
from paddlerobotics_tpu.etg.seeds import SEED_DIR
from paddlerobotics_tpu.train.pretrain import ETGPretrainer

TASKS = sys.argv[1:] or ["up_slope", "slopeslope", "stairstair"]


def main():
    import os

    os.makedirs(SEED_DIR, exist_ok=True)
    for mode in TASKS:
        cfg = QuadrupedConfig(
            sim=dataclasses.replace(QuadrupedConfig().sim,
                                    use_pallas=True),
            task=TaskConfig(task_mode=mode))
        t0 = time.time()
        tr = ETGPretrainer(cfg, outdir=f"/tmp/seed_{mode}")
        best, best_r, (w, b) = tr.train(generations=100, seed=0)
        path = f"{SEED_DIR}/{mode}.npz"
        np.savez(path, w=np.asarray(w), b=np.asarray(b),
                 param=np.asarray(best))
        print(json.dumps({"task": mode, "fitness": float(best_r),
                          "wall_s": round(time.time() - t0, 1),
                          "path": path}), flush=True)


if __name__ == "__main__":
    main()
