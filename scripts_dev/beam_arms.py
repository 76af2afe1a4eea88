"""Balance-beam round-4 arms: close the deterministic-eval gap.

Round-3 diagnosis (docs/task_matrix.md): the stochastic policy runs the
plank at 0.65-0.88 success for full 600-step episodes, but the
DETERMINISTIC (mean-action) policy drifts laterally and falls ~0.5 m in
(eval steps 44-64) in every arm tried — budget, stance geometry, and
schedule don't close it. Round-4 arms attack the drift directly:

  lat     --lateral shaping (centerline |y| + lateral speed + yaw)
  det     --det_frac mean-action rollout slice (eval-state replay)
  latdet  both

Usage: python scripts_dev/beam_arms.py [arms=lat,det,latdet] [budget=40000000]
"""

import dataclasses
import json
import os
import sys
import time
import traceback

import jax.numpy as jnp

from paddlerobotics_tpu.core.config import (ESConfig, QuadrupedConfig,
                                            RewardConfig, SACConfig,
                                            TaskConfig, TrainConfig)
from paddlerobotics_tpu.envs.registry import TASK_PRESETS
from paddlerobotics_tpu.etg import seeds as etg_seeds
from paddlerobotics_tpu.train.etg_rl import ETGRLTrainer

B = 4096
EVAL_STEPS = 600

ARMS = {
    # shipped preset (narrow stance + beam seed + critic reset) ± knobs
    "lat": dict(lateral=1.0, det_frac=0.0),
    "lat05": dict(lateral=0.5, det_frac=0.0),
    "det": dict(lateral=0.0, det_frac=0.25),
    "latdet": dict(lateral=1.0, det_frac=0.25),
    # entropy anneal: the sampled (training) distribution converges to
    # the deterministic one, so the mean action must stand on its own
    "anneal": dict(lateral=0.0, det_frac=0.0, anneal=True),
    "lat05_anneal": dict(lateral=0.5, det_frac=0.0, anneal=True),
    "latdet_anneal": dict(lateral=1.0, det_frac=0.25, anneal=True),
    # spawn-on-course curriculum (round-4 diagnosis: every episode dies
    # at plank ENTRY under autoreset, so replay holds no on-plank data)
    "spawn": dict(lateral=0.0, det_frac=0.0, spawn=True),
    "spawn_lat": dict(lateral=0.5, det_frac=0.0, spawn=True),
    "spawn_lat_anneal": dict(lateral=0.5, det_frac=0.0, spawn=True,
                             anneal=True),
    # drop the shipped beam seed: measured open-loop it falls in 14
    # steps even on FLAT ground while the default prior walks the
    # 0.4 m plank for 345/400 steps — the seed poisons warmup replay
    # and the ES start (round-4 probe, scripts_dev notes)
    "prior_spawn_lat": dict(lateral=0.5, det_frac=0.0, spawn=True,
                            no_seed=True),
    # + cap the speed incentive: torso reward saturates at
    # 2·vel_d m/s — sprinting is what kills on the plank
    "prior_spawn_lat_v03": dict(lateral=0.5, det_frac=0.0, spawn=True,
                                no_seed=True, vel_d=0.3),
    "prior_lat_v03": dict(lateral=0.5, det_frac=0.0, no_seed=True,
                          vel_d=0.3),
    # every arm so far peaks at an early checkpoint then decays —
    # pattern-matches the dr_study critic-reset-under-DR negative
    # result: drop the preset's 5M critic reset
    "psl_v03_noreset": dict(lateral=0.5, det_frac=0.0, spawn=True,
                            no_seed=True, vel_d=0.3, no_reset=True),
    # sample-efficiency schedule (round-3's strongest stochastic beam)
    "psl_v03_ln": dict(lateral=0.5, det_frac=0.0, spawn=True,
                       no_seed=True, vel_d=0.3, no_reset=True,
                       ln=True),
    # narrow track: step_y=0.02 walks the plank OPEN-LOOP for 575/600
    # steps (round-4 probe) — the reference's own step_y workflow
    # (README.md:65), just narrower than the 0.05 golden stance
    "sy02": dict(lateral=0.5, det_frac=0.0, spawn=True, no_seed=True,
                 vel_d=0.3, no_reset=True, step_y=0.02),
    "sy02_plain": dict(lateral=0.0, det_frac=0.0, no_seed=True,
                       step_y=0.02),
    "sy02_lat": dict(lateral=0.5, det_frac=0.0, no_seed=True,
                     vel_d=0.3, no_reset=True, step_y=0.02),
}


def run(arm: str, budget: int):
    knobs = ARMS[arm]
    preset = TASK_PRESETS.get("balance_beam", {})
    nb = 1024 if knobs.get("ln") else preset.get("num_envs", B)
    ups = 16 if knobs.get("ln") else preset.get("updates_per_step", 4)
    cfg = QuadrupedConfig(
        sim=dataclasses.replace(QuadrupedConfig().sim, use_pallas=True),
        etg=dataclasses.replace(
            QuadrupedConfig().etg,
            step_y=knobs.get("step_y",
                             preset.get("step_y",
                                        QuadrupedConfig().etg.step_y))),
        sac=SACConfig(warmup_steps=preset.get("warmup_steps", 200_000),
                      ln_critic=knobs.get("ln", False),
                      critic_reset_steps=(0 if knobs.get("no_reset") else
                                          preset.get("critic_reset_steps",
                                                     0)),
                      det_rollout_frac=knobs["det_frac"],
                      alpha_anneal_steps=(budget if knobs.get("anneal")
                                          else 0),
                      alpha_final=0.02),
        reward=RewardConfig(lateral=knobs["lateral"],
                            vel_d=knobs.get("vel_d", 0.5)),
        es=ESConfig(es_every_steps=400 * nb),
        # same plank geometry as the round-3 arm table (task_matrix.py)
        task=TaskConfig(task_mode="balance_beam", beam_width=0.4),
        train=TrainConfig(num_envs=nb, eval_every_steps=10**10,
                          e_step=400, eval_episode_len=EVAL_STEPS,
                          **(dict(spawn_x_max=3.0, spawn_x_frac=0.5,
                                  spawn_y=0.08, spawn_yaw=0.2)
                             if knobs.get("spawn") else {})),
    )
    # checkpoint every 4M so the best EVAL-protocol policy over the run
    # can be selected (the reference ships its best artifact; dr_study
    # round-3 precedent: eval-peak checkpoint selection)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, eval_every_steps=4_000_000))
    outdir = f"/tmp/beam_arms/{arm}"
    os.makedirs(outdir, exist_ok=True)
    tr = ETGRLTrainer(cfg, num_envs=nb, outdir=outdir,
                      updates_per_step=ups)
    seed_param = (None if knobs.get("no_seed")
                  else etg_seeds.load_seed_param("balance_beam"))
    t0 = time.time()
    carry, (w, b, p) = tr.train(
        max_steps=budget, chunk_steps=50, checkpoint=True,
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

    def eval_params(actor_params, ww, bb):
        ret, steps, infos = tr.evaluate(actor_params, ww, bb, EVAL_STEPS)
        steps_f = max(float(steps), 1.0)
        return {"eval_velx": round(float(infos["velx"]) / steps_f, 3),
                "eval_success": round(float(infos["success"]) / steps_f, 3),
                "eval_return": round(float(ret), 2),
                "eval_steps": round(steps_f, 1)}

    final = eval_params(carry.sac_state.actor_params, w, b)

    # eval-peak checkpoint selection over the run's saved artifacts
    import jax

    from paddlerobotics_tpu.train import checkpoints

    best = dict(final)
    best_src = "final"
    tmpl_sac = tr.sac.init(jax.random.key(0))
    for name in sorted(os.listdir(outdir)):
        if not name.startswith("itr_"):
            continue
        try:
            restored = checkpoints.restore(os.path.join(outdir, name), {
                "sac": tmpl_sac._asdict(),
                "etg_w": jnp.zeros_like(w), "etg_b": jnp.zeros_like(b),
                "etg_param": jnp.zeros_like(p)})
        except Exception:
            continue
        ww, bb = tr.fit_etg(jnp.asarray(restored["etg_param"]))
        r = eval_params(restored["sac"]["actor_params"], ww, bb)
        if (r["eval_steps"], r["eval_velx"]) > (best["eval_steps"],
                                                best["eval_velx"]):
            best, best_src = r, name

    return {"arm": arm, **knobs, "wall_s": round(wall, 1),
            "schedule": f"B={nb}/K={ups}",
            "train_velx": tail(velx), "train_success": tail(succ),
            **final,
            "best": best, "best_src": best_src}


def main():
    arms = ["lat", "det", "latdet"]
    budget = 40_000_000
    for a in sys.argv[1:]:
        if a.startswith("arms="):
            arms = a.split("=", 1)[1].split(",")
        elif a.startswith("budget="):
            budget = int(a.split("=", 1)[1])
    os.makedirs("/tmp/beam_arms", exist_ok=True)
    summary_path = "/tmp/beam_arms/summary.json"
    results = (json.load(open(summary_path))
               if os.path.exists(summary_path) else [])
    for arm in arms:
        print(f"=== {arm} ===", flush=True)
        try:
            r = run(arm, budget)
        except Exception:
            traceback.print_exc()
            r = {"arm": arm, "error": traceback.format_exc()[-300:]}
        print(json.dumps(r), flush=True)
        results.append(r)
        with open(summary_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
