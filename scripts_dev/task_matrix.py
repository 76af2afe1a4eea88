"""Nine-task training matrix (reference README: 'Well-trained ETG and
neural network model in nine tasks', nine_block.gif).

Trains every terrain task mode with the DEFAULT reward weights and its
registered schedule (envs/registry.TASK_PRESETS — the wall-clock
B=4096/K=4 default, or the sample-efficiency schedule + shipped ETG
seed + stabilizer where the preset says so), then scores the trained
policy with a DETERMINISTIC 600-step eval episode batch
(train.py:373-385 semantics: env.step(autoreset=False), mean-action
policy) so the reported numbers follow the reference's eval protocol
rather than train-time rollout stats. Writes
/tmp/task_matrix/summary.json; docs/task_matrix.md is written from it.
"""

import dataclasses
import json
import os
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from paddlerobotics_tpu.core.config import (ESConfig, QuadrupedConfig,
                                            SACConfig, TaskConfig,
                                            TrainConfig)
from paddlerobotics_tpu.envs.registry import TASK_PRESETS
from paddlerobotics_tpu.etg import seeds as etg_seeds
from paddlerobotics_tpu.sim.terrain import TASK_MODES
from paddlerobotics_tpu.train.etg_rl import ETGRLTrainer

B = 4096
BUDGET = 20_000_000
EVAL_STEPS = 600


def run(mode: str, suffix: str = "", budget: int = BUDGET):
    preset = TASK_PRESETS.get(mode, {})
    nb = preset.get("num_envs", B)
    ups = preset.get("updates_per_step", 4)
    task_kw = dict(task_mode=mode)
    if mode == "balance_beam":
        # wider plank for the default stance (docs/task_matrix.md)
        task_kw["beam_width"] = 0.4
    cfg = QuadrupedConfig(
        sim=dataclasses.replace(QuadrupedConfig().sim, use_pallas=True),
        etg=dataclasses.replace(
            QuadrupedConfig().etg,
            step_y=preset.get("step_y", QuadrupedConfig().etg.step_y)),
        sac=SACConfig(warmup_steps=preset.get("warmup_steps", 200_000),
                      ln_critic=preset.get("ln_critic", False),
                      critic_reset_steps=preset.get("critic_reset_steps",
                                                    0)),
        # ES at the wall-ratio-preserving cadence (400*B, see
        # docs/update_schedule.md addendum) so 10 tasks fit one sweep
        es=ESConfig(es_every_steps=400 * nb),
        task=TaskConfig(**task_kw),
        train=TrainConfig(num_envs=nb, eval_every_steps=10**10,
                          e_step=400, eval_episode_len=EVAL_STEPS),
    )
    outdir = f"/tmp/task_matrix/{mode}{suffix}"
    os.makedirs(outdir, exist_ok=True)
    tr = ETGRLTrainer(cfg, num_envs=nb, outdir=outdir,
                      updates_per_step=ups)
    seed_param = etg_seeds.load_seed_param(mode)
    t0 = time.time()
    carry, (w, b, p) = tr.train(
        max_steps=budget, chunk_steps=50, checkpoint=False,
        init_etg_param=None if seed_param is None
        else jnp.asarray(seed_param))
    wall = time.time() - t0

    velx, succ = [], []
    for line in open(f"{outdir}/metrics.jsonl"):
        d = json.loads(line)
        if d["tag"] == "train/mean_velx":
            velx.append(d["value"])
        elif d["tag"] == "train/mean_success":
            succ.append(d["value"])
    tail = lambda xs: round(sum(xs[-8:]) / max(len(xs[-8:]), 1), 3)

    # deterministic eval pass (reference protocol, train.py:373-385)
    ret, steps, infos = tr.evaluate(carry.sac_state.actor_params, w, b,
                                    EVAL_STEPS)
    steps_f = max(float(steps), 1.0)
    eval_velx = float(infos["velx"]) / steps_f
    eval_succ = float(infos["success"]) / steps_f
    return {"task": mode + suffix, "wall_s": round(wall, 1),
            "schedule": f"B={nb}/K={ups}"
                        + ("/LN" if preset.get("ln_critic") else "")
                        + ("/seed" if seed_param is not None else ""),
            "final_velx": tail(velx), "final_success": tail(succ),
            "peak_velx": round(max(velx), 3),
            "eval_velx": round(eval_velx, 3),
            "eval_success": round(eval_succ, 3),
            "eval_return": round(float(ret), 2),
            "eval_steps": round(steps_f, 1)}


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
