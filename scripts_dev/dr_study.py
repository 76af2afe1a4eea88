"""Full-range domain-randomization study (VERDICT round-1 item #4 tail).

Context: the reference's headline recipe trains with DR OFF
(`--random_dynamic` default 0, ETGRL/train.py:460); the full
param2dynamic ranges (train.py:112-126) are an opt-in robustness mode
with no published success baseline. This study measures how far the
curriculum (dr_scale_start → 1.0) gets on flat ground, whether the
privileged dynamics echo (SENSOR_MODE["dynamic_vec"]) helps, and what
fraction of full-range draws are physically walkable at all
(success-vs-friction feasibility probe on the trained policy).

Writes /tmp/dr_study/summary.json; docs/dr_study.md is written from it.
"""

import dataclasses
import json
import os
import time
import traceback

import jax
import jax.numpy as jnp

from paddlerobotics_tpu.core.config import (ESConfig, QuadrupedConfig,
                                            RandomConfig, SACConfig,
                                            SensorConfig, SimConfig,
                                            TaskConfig, TrainConfig)
from paddlerobotics_tpu.envs import randomize
from paddlerobotics_tpu.train.etg_rl import ETGRLTrainer

B = 4096
ES_OFF = 10**15

RUNS = [
    # name, budget, random cfg kwargs, dynamic_vec obs
    ("full_flat", 60_000_000,
     dict(random_dynamics=True, dynamics_scale=1.0), False),
    ("curriculum", 120_000_000,
     dict(random_dynamics=True, dynamics_scale=1.0,
          dr_scale_start=0.3, dr_curriculum_steps=80_000_000), False),
    ("curr_dynvec", 120_000_000,
     dict(random_dynamics=True, dynamics_scale=1.0,
          dr_scale_start=0.3, dr_curriculum_steps=80_000_000), True),
]


def make_cfg(rand_kwargs, dynamic_vec):
    return QuadrupedConfig(
        sim=SimConfig(use_pallas=True),
        sac=SACConfig(warmup_steps=200_000),
        es=ESConfig(es_every_steps=ES_OFF),
        sensors=SensorConfig(dynamic_vec=dynamic_vec),
        random=RandomConfig(**rand_kwargs),
        task=TaskConfig(task_mode="ground"),
        train=TrainConfig(num_envs=B, eval_every_steps=20_000_000,
                          e_step=400, eval_episode_len=400),
    )


def feasibility_probe(tr: ETGRLTrainer, carry, w, b, n_steps=400):
    """Success vs friction draw: per-env normalized params with p[1]
    (foot friction) swept over a grid, other dims sampled at full
    range. Returns list of (friction_coeff, mean_velx, success)."""
    env = tr.env
    rng = jax.random.key(123)
    k_p, k_env = jax.random.split(rng)
    p = jax.random.uniform(k_p, (B, randomize.NUM_DYNAMIC_PARAMS),
                           minval=-1.0, maxval=1.0)
    # friction = clip(0.2 + 10·g, 0, 20): one ice row (g=-0.1 → 0) then
    # a feasible ramp 0.2..10.2 (g below -0.02 all clip to 0 — don't
    # waste 8 duplicate rows there)
    grid = jnp.concatenate([jnp.asarray([-0.1]),
                            jnp.linspace(0.0, 1.0, 15)])
    p = p.at[:, 1].set(jnp.repeat(grid, B // 16))
    dp = jax.vmap(randomize.param2dynamic)(p)
    from paddlerobotics_tpu.envs.batched_env import BDynParams
    dyn = BDynParams.from_leading(dp)
    w_env, b_env = tr._broadcast_etg(w, b)
    state, obs = jax.jit(env.reset, static_argnames=())(
        k_env, w_env, b_env, dyn=dyn)

    def body(c, _):
        state, obs, velx, alive, succ = c
        action = tr.sac.predict(carry.sac_state.actor_params, obs)
        ns, nobs, rew, done, info = env.step(
            state, action * tr.act_bound + tr.act_offset, autoreset=False)
        velx = velx + info["velx"] * alive
        succ = succ + info["success"] * alive
        alive = alive * (1.0 - done.astype(jnp.float32))
        return (ns, nobs, velx, alive, succ), None

    init = (state, obs, jnp.zeros(B), jnp.ones(B), jnp.zeros(B))
    (state, obs, velx, alive, succ), _ = jax.jit(
        lambda i: jax.lax.scan(body, i, None, length=n_steps))(init)
    velx = (velx / n_steps).reshape(16, B // 16).mean(axis=1)
    succ = (succ / n_steps).reshape(16, B // 16).mean(axis=1)
    fric = jnp.clip(0.2 + 10.0 * grid, 0.0, 20.0)
    return [(round(float(f), 2), round(float(v), 3), round(float(s), 3))
            for f, v, s in zip(fric, velx, succ)]


def run(name, budget, rand_kwargs, dynamic_vec):
    outdir = f"/tmp/dr_study/{name}"
    cfg = make_cfg(rand_kwargs, dynamic_vec)
    tr = ETGRLTrainer(cfg, num_envs=B, outdir=outdir, updates_per_step=4)
    t0 = time.time()
    carry, (w, b, _) = tr.train(max_steps=budget, chunk_steps=50,
                                checkpoint=False)
    wall = time.time() - t0

    velx, succ = [], []
    for line in open(f"{outdir}/metrics.jsonl"):
        d = json.loads(line)
        if d["tag"] == "train/mean_velx":
            velx.append(d["value"])
        elif d["tag"] == "train/mean_success":
            succ.append(d["value"])
    tail = lambda xs: round(sum(xs[-8:]) / max(len(xs[-8:]), 1), 3)
    out = {
        "name": name, "budget": budget, "dynamic_vec": dynamic_vec,
        "wall_s": round(wall, 1),
        "final_velx": tail(velx), "final_success": tail(succ),
    }
    out["feasibility"] = feasibility_probe(tr, carry, w, b)
    return out


def main():
    os.makedirs("/tmp/dr_study", exist_ok=True)
    results = []
    for name, budget, rk, dv in RUNS:
        print(f"=== {name} ===", flush=True)
        try:
            r = run(name, budget, rk, dv)
        except Exception:
            traceback.print_exc()
            r = {"name": name, "error": traceback.format_exc()[-500:]}
        print(json.dumps(r), flush=True)
        results.append(r)
        with open("/tmp/dr_study/summary.json", "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
