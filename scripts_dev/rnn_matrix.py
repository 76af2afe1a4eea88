"""RNN sensor-mode study under domain randomization (round-5).

The reference's sim2real robustness story trains policies on temporal
observation history (SENSOR_MODE['RNN'] = {time_steps, time_interval,
mode: stack|GRU}, train.py:273-277) — the implicit claim being that
history lets the policy INFER the latent dynamics that the privileged
`dynamic_vec` echo (train.py:262-277) would otherwise hand it. The
wiring has existed since round 2 (algos/networks.GRUActor,
envs/wrappers.ObsHistoryWrapper) but no policy was ever TRAINED
through it.

This script tests exactly that claim at a feasible operating point:
ground task, per-draw jittered DR at scale 0.5 (U(0, 0.5) per episode
— full fixed-scale DR from scratch flatlines EVERY arm, see
docs/dr_study.md §2 and the failed full-scale run recorded in
docs/task_matrix.md round-5 note), NO dynamic_vec. Arms:

  ff      — feedforward on the plain 49-d obs (lower control)
  stack   — obs history stacked (reference mode 'stack')
  GRU     — recurrent actor over the history window (reference 'GRU')
  dynvec  — feedforward + privileged dynamic_vec (upper control: the
            information history is supposed to recover)

Each trained policy is then scored with the deterministic 600-step
eval at FIXED draw scales (0, 0.25, 0.5, 0.75, 1.0) — the quantity the
sim2real story deploys (robustness across the dynamics range), same
protocol as the stairs+DR study (scripts_dev/stairs_dr_run.py).

    python scripts_dev/rnn_matrix.py [--budget 20000000]

Writes <root>/summary.json; docs table in docs/task_matrix.md.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_cfg(arm: str, time_steps: int, use_pallas: bool):
    from paddlerobotics_tpu.core.config import (ESConfig, QuadrupedConfig,
                                                RandomConfig, SACConfig,
                                                SensorConfig, TaskConfig,
                                                TrainConfig)

    base = QuadrupedConfig()
    sensors = SensorConfig(dynamic_vec=(arm == "dynvec"))
    if arm in ("stack", "GRU"):
        sensors = dataclasses.replace(sensors, rnn_mode=arm,
                                      rnn_time_steps=time_steps)
    return QuadrupedConfig(
        sim=dataclasses.replace(base.sim, use_pallas=use_pallas),
        sensors=sensors,
        sac=SACConfig(warmup_steps=200_000, ln_critic=True),
        # ES fitness at nominal dynamics (the stairs+DR verdict:
        # random draws must not walk the gait prior away)
        es=ESConfig(es_every_steps=400 * 1024),
        random=RandomConfig(random_dynamics=True, dynamics_scale=0.5,
                            dr_scale_jitter=True),
        task=TaskConfig(task_mode="ground"),
        train=TrainConfig(num_envs=1024, e_step=400,
                          eval_every_steps=10 ** 12,
                          eval_episode_len=600),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--budget", type=int, default=20_000_000)
    p.add_argument("--root", type=str, default="/tmp/rnn_matrix")
    p.add_argument("--arms", type=str, default="ff,stack,GRU,dynvec")
    p.add_argument("--time_steps", type=int, default=5,
                   help="history length (reference --timesteps 5)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from paddlerobotics_tpu.etg import seeds as etg_seeds
    from paddlerobotics_tpu.train.etg_rl import ETGRLTrainer

    os.makedirs(args.root, exist_ok=True)
    rows = []
    for arm in args.arms.split(","):
        print(f"=== ground+DR(0.5 jitter) / {arm} ===", flush=True)
        try:
            cfg = build_cfg(arm, args.time_steps,
                            use_pallas=jax.default_backend() == "tpu")
            outdir = os.path.join(args.root, arm)
            tr = ETGRLTrainer(cfg, num_envs=1024, outdir=outdir,
                              updates_per_step=16)
            seed_param = etg_seeds.load_seed_param("ground")
            t0 = time.time()
            carry, (w, b, _) = tr.train(
                max_steps=args.budget, chunk_steps=50, checkpoint=False,
                seed=0, init_etg_param=None if seed_param is None
                else jnp.asarray(seed_param))
            r = {"arm": arm, "wall_s": round(time.time() - t0, 1)}
            for scale in (0.0, 0.25, 0.5, 0.75, 1.0):
                ret, steps, infos = tr.evaluate(
                    carry.sac_state.actor_params, w, b, 600,
                    dr_scale=scale)
                sf = max(float(steps), 1.0)
                r[f"s{scale}"] = {
                    "velx": round(float(infos["velx"]) / sf, 3),
                    "success": round(float(infos["success"]) / sf, 3),
                    "steps": round(sf, 1)}
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
