"""Plasticity-stabilizer sweep (VERDICT r2 weak #4 / next #4).

docs/update_schedule.md finding 3: high update-to-data schedules peak
near 5M env steps then decay. This sweep re-runs the affected
schedules on stairstair with ES off (same methodology as the round-2
ups_sweep) under three arms — baseline, LayerNorm critics
(--ln_critic), periodic critic reset (--critic_reset_steps 5M) — to
20M steps, and reports peak@<=5M vs final, flagging any arm that dips
more than 10% below its 5M peak.

Writes /tmp/stab_sweep/summary.json.
"""

import dataclasses
import json
import os
import time
import traceback

from paddlerobotics_tpu.core.config import (ESConfig, QuadrupedConfig,
                                            SACConfig, TaskConfig,
                                            TrainConfig)
from paddlerobotics_tpu.train.etg_rl import ETGRLTrainer

BUDGET = 20_000_000
ES_OFF = 10 ** 12

ARMS = [("base", dict()),
        ("ln", dict(ln_critic=True)),
        ("reset", dict(critic_reset_steps=5_000_000)),
        ("lnreset", dict(ln_critic=True,
                         critic_reset_steps=5_000_000))]
SCHEDS = [("B1024_K16", 1024, 16), ("B256_K64", 256, 64)]


def run(tag, B, K, arm, arm_kw, seed=0, etg_seed=False):
    cfg = QuadrupedConfig(
        sim=dataclasses.replace(QuadrupedConfig().sim, use_pallas=True),
        sac=SACConfig(warmup_steps=200_000, **arm_kw),
        es=ESConfig(es_every_steps=ES_OFF),
        task=TaskConfig(task_mode="stairstair"),
        train=TrainConfig(num_envs=B, eval_every_steps=10 ** 12),
    )
    outdir = f"/tmp/stab_sweep/{tag}_{arm}_s{seed}" + \
        ("_etgseed" if etg_seed else "")
    os.makedirs(outdir, exist_ok=True)
    tr = ETGRLTrainer(cfg, num_envs=B, outdir=outdir,
                      updates_per_step=K)
    init_etg = None
    if etg_seed:
        import jax.numpy as jnp

        from paddlerobotics_tpu.etg import seeds as etg_seeds
        p = etg_seeds.load_seed_param("stairstair")
        init_etg = None if p is None else jnp.asarray(p)
    t0 = time.time()
    tr.train(max_steps=BUDGET, chunk_steps=50, seed=seed,
             checkpoint=False, init_etg_param=init_etg)
    wall = time.time() - t0
    velx = []
    for line in open(f"{outdir}/metrics.jsonl"):
        d = json.loads(line)
        if d["tag"] == "train/mean_velx":
            velx.append((d["step"], d["value"]))
    early = [v for s, v in velx if s <= 5_000_000]
    tail = [v for s, v in velx][-8:]
    peak5 = max(early) if early else 0.0
    final = sum(tail) / max(len(tail), 1)
    return {"sched": tag, "arm": arm, "seed": seed,
            "peak_5M": round(peak5, 3), "final_20M": round(final, 3),
            "peak_all": round(max(v for _, v in velx), 3),
            "holds": bool(final >= 0.9 * peak5),
            "wall_s": round(wall, 1)}


def main():
    import sys

    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    only = sys.argv[2] if len(sys.argv) > 2 else None
    etg_seed = "etgseed" in sys.argv[3:]
    arm_filter = None
    for a in sys.argv[3:]:
        if a.startswith("arms="):
            arm_filter = a[5:].split(",")
    os.makedirs("/tmp/stab_sweep", exist_ok=True)
    summary = f"/tmp/stab_sweep/summary_s{seed}" + \
        ("_etgseed" if etg_seed else "") + ".json"
    results = []
    for tag, B, K in SCHEDS:
        if only and tag != only:
            continue
        for arm, kw in ARMS:
            if arm_filter and arm not in arm_filter:
                continue
            try:
                r = run(tag, B, K, arm, kw, seed=seed, etg_seed=etg_seed)
            except Exception:
                traceback.print_exc()
                r = {"sched": tag, "arm": arm,
                     "error": traceback.format_exc()[-200:]}
            print(json.dumps(r), flush=True)
            results.append(r)
            with open(summary, "w") as f:
                json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
