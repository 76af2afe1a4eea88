"""Balance-beam deterministic-fall diagnostic: roll the mean-action
policy from a saved arm checkpoint and log the base trajectory (x, y,
yaw, height, foot contacts) around the fall, batched over envs so the
fall statistics are population-level, not one rollout.

Usage: python scripts_dev/beam_diag.py /tmp/beam_arms/<arm> [steps=200]
"""

import dataclasses
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from paddlerobotics_tpu.core.config import (ESConfig, QuadrupedConfig,
                                            RewardConfig, SACConfig,
                                            TaskConfig, TrainConfig)
from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv
from paddlerobotics_tpu.envs.registry import TASK_PRESETS
from paddlerobotics_tpu.etg import fit as etg_fit
from paddlerobotics_tpu.train import checkpoints
from paddlerobotics_tpu.train.etg_rl import ETGRLTrainer

outdir = sys.argv[1]
steps = 200
B = 256
for a in sys.argv[2:]:
    if a.startswith("steps="):
        steps = int(a.split("=", 1)[1])

preset = TASK_PRESETS.get("balance_beam", {})
cfg = QuadrupedConfig(
    sim=dataclasses.replace(QuadrupedConfig().sim,
                            use_pallas=jax.default_backend() == "tpu"),
    etg=dataclasses.replace(QuadrupedConfig().etg,
                            step_y=preset.get("step_y", 0.05)),
    sac=SACConfig(),
    task=TaskConfig(task_mode="balance_beam", beam_width=0.4),
    train=TrainConfig(num_envs=B, eval_every_steps=10**12),
)
tr = ETGRLTrainer(cfg, num_envs=B, outdir="/tmp/beam_diag",
                  updates_per_step=0)
step_n = checkpoints.latest_step(outdir)
restored = checkpoints.restore(f"{outdir}/itr_{step_n}", {
    "sac": tr.sac.init(jax.random.key(0))._asdict(),
    "etg_w": jnp.zeros((3, cfg.etg.H)), "etg_b": jnp.zeros(3),
    "etg_param": jnp.zeros(cfg.es.num_params)})
w, b = tr.fit_etg(jnp.asarray(restored["etg_param"]))
actor = restored["sac"]["actor_params"]

env = tr.env
wB = jnp.broadcast_to(jnp.asarray(w)[..., None], w.shape + (B,))
bB = jnp.broadcast_to(jnp.asarray(b)[..., None], (3, B))
state, obs = jax.jit(lambda k: env.reset(k, etg_w=wB, etg_b=bB))(
    jax.random.key(0))


STOCHASTIC = any(a == "stochastic" for a in sys.argv[2:])


@jax.jit
def rollout(state, obs):
    def body(c, _):
        state, obs, alive, key = c
        key, k = jax.random.split(key)
        if STOCHASTIC:
            act, _ = tr.sac.sample(actor, obs, k)
        else:
            act = tr.sac.predict(actor, obs)
        ns, nobs, rew, done, info = env.step(
            state, act * tr.act_bound + tr.act_offset, autoreset=False)
        s = ns.robot.s
        from paddlerobotics_tpu.sim import sbatch
        Rb = sbatch.quat_to_mat_cols(s.quat)
        yaw = jnp.arctan2(Rb[1][0], Rb[0][0])
        rec = {"x": s.pos[0], "y": s.pos[1], "z": s.pos[2], "yaw": yaw,
               "contacts": jnp.sum(ns.robot.contact.foot_contact.astype(
                   jnp.float32), axis=0),
               "alive": alive, "done": done.astype(jnp.float32)}
        alive = alive * (1.0 - done.astype(jnp.float32))
        return (ns, nobs, alive, key), rec

    (state, obs, alive, _), recs = jax.lax.scan(
        body, (state, obs, jnp.ones(B), jax.random.key(7)), None,
        length=steps)
    return recs


recs = jax.tree.map(np.asarray, rollout(state, obs))
alive = recs["alive"]
fall_step = alive.sum(0).astype(int)          # per-env survival
print(json.dumps({
    "ckpt": f"itr_{step_n}", "B": B,
    "survival_mean": float(fall_step.mean()),
    "survival_p10": int(np.percentile(fall_step, 10)),
    "survival_p90": int(np.percentile(fall_step, 90)),
    "full_survival_frac": float((fall_step >= steps).mean()),
}))

# population stats along the course: |y| and yaw where still alive
for t in range(0, steps, 10):
    m = alive[t] > 0.5
    if m.sum() < 3:
        break
    print(json.dumps({
        "t": t,
        "alive_frac": round(float(m.mean()), 3),
        "x_mean": round(float(recs["x"][t][m].mean()), 3),
        "absy_mean": round(float(np.abs(recs["y"][t][m]).mean()), 4),
        "absy_p90": round(float(np.percentile(np.abs(recs["y"][t][m]),
                                              90)), 4),
        "absyaw_mean": round(float(np.abs(recs["yaw"][t][m]).mean()), 4),
        "z_mean": round(float(recs["z"][t][m].mean()), 3),
        "contacts_mean": round(float(recs["contacts"][t][m].mean()), 2),
    }))

# where do falls happen (x position at the last alive step)?
died = fall_step < steps
if died.any():
    xs = recs["x"][np.minimum(fall_step[died], steps - 1), died]
    ys = recs["y"][np.minimum(fall_step[died], steps - 1), died]
    print(json.dumps({
        "fall_x_mean": round(float(xs.mean()), 3),
        "fall_x_p10": round(float(np.percentile(xs, 10)), 3),
        "fall_x_p90": round(float(np.percentile(xs, 90)), 3),
        "fall_absy_mean": round(float(np.abs(ys).mean()), 4),
    }))
