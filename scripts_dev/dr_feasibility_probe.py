"""Which full-range dynamics draws are walkable AT ALL?

Rolls the open-loop ETG gait (zero policy — the gait every SAC run
starts from) under B full-range param2dynamic draws and correlates
episode survival / forward progress with each normalized parameter.
Separates "full-range DR is unlearnable" (policy problem) from
"full-range draws are unwalkable" (physics/task problem).

Runs on CPU (TPU may be busy with training). Writes
/tmp/dr_study/feasibility_openloop.json.
"""

import json
import os

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from paddlerobotics_tpu.core.config import QuadrupedConfig  # noqa: E402
from paddlerobotics_tpu.envs import randomize  # noqa: E402
from paddlerobotics_tpu.envs.batched_env import (BatchedQuadrupedEnv,  # noqa: E402
                                                 BDynParams)

B = 1024
STEPS = 400
import sys  # noqa: E402

TASK = sys.argv[1] if len(sys.argv) > 1 else "ground"
SCALE = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
USE_SEED = len(sys.argv) > 3 and sys.argv[3] == "seed"

def factor_scalars(p):
    """Collapse the 48-dim normalized draw into named per-factor
    scalars (param2dynamic layout: randomize.py:24-38)."""
    import jax.numpy as jnp
    return {
        "latency": p[:, 0], "friction": p[:, 1], "base_mass": p[:, 2],
        "base_inertia": p[:, 3:6].mean(1), "leg_mass": p[:, 6:9].mean(1),
        "leg_inertia": p[:, 9:21].mean(1), "kp": p[:, 21:33].mean(1),
        "kd": p[:, 33:45].mean(1),
        "gravity_xy": jnp.abs(p[:, 45:47]).mean(1),
        "gravity_z": p[:, 47],
    }


def main():
    import dataclasses

    cfg = QuadrupedConfig()
    cfg = dataclasses.replace(
        cfg, task=dataclasses.replace(cfg.task, task_mode=TASK))
    # injected full-range draws carry 0-80 ms latency; cfg.random is off
    # so force the obs blend to reach the whole ring
    cfg = dataclasses.replace(cfg, sim=dataclasses.replace(
        cfg.sim, obs_latency_taps=cfg.sim.latency_buffer_len))
    env = BatchedQuadrupedEnv(cfg, num_envs=B)

    key = jax.random.key(7)
    k_p, k_env = jax.random.split(key)
    # round-3 curriculum semantics (randomize.sample_dynamics): physical
    # interpolation between nominal dynamics at scale 0 and a full
    # reference draw at 1 — NOT scaling the normalized vector.
    p = jax.random.uniform(
        k_p, (B, randomize.NUM_DYNAMIC_PARAMS), minval=-1.0, maxval=1.0)
    drawn = jax.vmap(randomize.param2dynamic)(p)
    nominal = jax.vmap(lambda _: randomize.DynamicsParams.default())(
        jnp.zeros(B))
    dp = jax.tree.map(lambda d, r: d + SCALE * (r - d), nominal, drawn)
    dyn = BDynParams.from_leading(dp)

    etg_kw = {}
    if USE_SEED:
        # start from the shipped per-task ETG seed gait (the gait every
        # seeded SAC run starts from), not the flat-ground prior
        from paddlerobotics_tpu.etg import fit as etg_fit
        from paddlerobotics_tpu.etg import seeds as etg_seeds
        param = etg_seeds.load_seed_param(TASK)
        if param is not None:
            pts = etg_fit.prior_points(cfg.etg) + param.reshape(6, 2)
            w0, b0 = etg_fit.opt_with_points(cfg.etg)
            w, b = etg_fit.opt_with_points(cfg.etg, points=pts,
                                           w0=w0, b0=b0)
            etg_kw = dict(
                etg_w=jnp.broadcast_to(jnp.asarray(w)[..., None],
                                       w.shape + (B,)),
                etg_b=jnp.broadcast_to(jnp.asarray(b)[..., None],
                                       (3, B)))
    state, obs = jax.jit(env.reset)(k_env, dyn=dyn, **etg_kw)

    def body(c, _):
        state, velx, alive, steps = c
        ns, nobs, rew, done, info = env.step(
            state, jnp.zeros((B, 12)), autoreset=False)
        velx = velx + info["velx"] * alive
        steps = steps + alive
        alive = alive * (1.0 - done.astype(jnp.float32))
        return (ns, velx, alive, steps), None

    init = (state, jnp.zeros(B), jnp.ones(B), jnp.zeros(B))
    (state, velx, alive, steps), _ = jax.jit(
        lambda i: jax.lax.scan(body, i, None, length=STEPS))(init)

    steps = jnp.maximum(steps, 1.0)
    mean_velx = velx / steps
    survived = steps >= STEPS * 0.95          # stood/walked the episode
    walked = mean_velx >= 0.15                # made real forward progress

    out = {
        "B": B, "steps": STEPS, "task": TASK, "scale": SCALE,
        "seed_gait": USE_SEED,
        "survive_frac": round(float(survived.mean()), 3),
        "walk_frac": round(float(walked.mean()), 3),
        "mean_episode_steps": round(float(steps.mean()), 1),
        "median_velx": round(float(jnp.median(mean_velx)), 3),
    }

    # per-factor conditional survival: split each factor at 0 (nominal);
    # big lo/hi gaps identify the killers.
    factors = factor_scalars(p)
    per_param = {}
    for name, v in factors.items():
        lo = v < jnp.median(v)
        per_param[name] = {
            "survive_lo_half": round(float(survived[lo].mean()), 3),
            "survive_hi_half": round(float(survived[~lo].mean()), 3),
            "walk_lo_half": round(float(walked[lo].mean()), 3),
            "walk_hi_half": round(float(walked[~lo].mean()), 3),
        }
    out["per_param"] = per_param

    # decile profile for the usual suspects
    for name in ("friction", "kp", "kd", "latency", "gravity_z"):
        v = factors[name]
        qs = jnp.quantile(v, jnp.linspace(0, 1, 11))
        prof = []
        for d in range(10):
            m = (v >= qs[d]) & (v <= qs[d + 1])
            prof.append([round(float((qs[d] + qs[d + 1]) / 2), 2),
                         round(float(survived[m].mean()), 3),
                         round(float(walked[m].mean()), 3)])
        out[f"decile_{name}"] = prof

    os.makedirs("/tmp/dr_study", exist_ok=True)
    path = (f"/tmp/dr_study/feasibility_{TASK}_{SCALE}" +
            ("_seed" if USE_SEED else "") + ".json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
