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
    import jax
    import jax.numpy as jnp

    from paddlerobotics_tpu.envs.registry import TASK_PRESETS

    for mode in TASKS:
        preset = TASK_PRESETS.get(mode, {})
        cfg = QuadrupedConfig(
            sim=dataclasses.replace(QuadrupedConfig().sim,
                                    use_pallas=True),
            etg=dataclasses.replace(
                QuadrupedConfig().etg,
                step_y=preset.get("step_y",
                                  QuadrupedConfig().etg.step_y)),
            task=TaskConfig(task_mode=mode))
        t0 = time.time()
        # B=5120 (divisible by popsize 40 AND the pallas block 1024):
        # 128 envs per candidate — small-B fitness is too noisy and ES
        # converges on flailing-that-falls (the round-3 B=320 attempt
        # produced falls-at-step-7 "seeds")
        tr = ETGPretrainer(cfg, num_envs=5120, outdir=f"/tmp/seed_{mode}")
        best, best_r, (w, b) = tr.train(generations=150, seed=0)

        # health gate: the seed gait must SURVIVE open-loop at nominal
        # dynamics (400 steps, autoreset off) before we ship it
        from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv
        env = BatchedQuadrupedEnv(cfg, num_envs=8)
        wB = jnp.broadcast_to(jnp.asarray(w)[..., None], w.shape + (8,))
        bB = jnp.broadcast_to(jnp.asarray(b)[..., None], (3, 8))
        st, _ = jax.jit(env.reset)(jax.random.key(0), etg_w=wB, etg_b=bB)

        def body(c, _):
            st, alive, steps = c
            ns, _, _, done, info = env.step(st, jnp.zeros((8, 12)),
                                            autoreset=False)
            steps = steps + alive
            alive = alive * (1.0 - done.astype(jnp.float32))
            return (ns, alive, steps), None

        (st, alive, steps), _ = jax.jit(lambda c: jax.lax.scan(
            body, c, None, length=400))((st, jnp.ones(8),
                                         jnp.zeros(8)))
        surv = float(jnp.mean(steps)) / 400.0
        rec = {"task": mode, "fitness": float(best_r),
               "openloop_survival": round(surv, 3),
               "wall_s": round(time.time() - t0, 1)}
        if surv >= 0.95:
            path = f"{SEED_DIR}/{mode}.npz"
            np.savez(path, w=np.asarray(w), b=np.asarray(b),
                     param=np.asarray(best))
            rec["path"] = path
        else:
            rec["skipped"] = "seed gait falls open-loop at nominal"
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
