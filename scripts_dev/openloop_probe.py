"""Probe: open-loop (zero-policy) survival/velocity of the default ETG
prior at nominal dynamics, per task mode. Diagnoses whether the ES
pretrain fitness landscape rewards dying (per-step reward < 0) or the
prior itself falls under the round-3 delayed-PD physics."""

import dataclasses
import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from paddlerobotics_tpu.core.config import QuadrupedConfig, TaskConfig
from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv

TASKS = sys.argv[1:] or ["ground", "up_slope", "slopeslope", "stairstair"]
B = 8


def main():
    for mode in TASKS:
        cfg = QuadrupedConfig(task=TaskConfig(task_mode=mode))
        env = BatchedQuadrupedEnv(cfg, num_envs=B)
        st, _ = jax.jit(env.reset)(jax.random.key(0))

        def body(c, _):
            st, alive, steps, ret, x = c
            ns, _, rew, done, info = env.step(st, jnp.zeros((B, 12)),
                                              autoreset=False)
            steps = steps + alive
            ret = ret + rew * alive
            x = x + info["velx"] * alive
            alive = alive * (1.0 - done.astype(jnp.float32))
            return (ns, alive, steps, ret, x), None

        (st, alive, steps, ret, x), _ = jax.jit(
            lambda c: jax.lax.scan(body, c, None, length=400))(
            (st, jnp.ones(B), jnp.zeros(B), jnp.zeros(B), jnp.zeros(B)))
        print(json.dumps({
            "task": mode,
            "survival": round(float(jnp.mean(steps)) / 400.0, 3),
            "ret_sum": round(float(jnp.mean(ret)), 2),
            "ret_per_step": round(float(jnp.mean(ret / jnp.maximum(steps, 1))), 4),
            "velx": round(float(jnp.mean(x / jnp.maximum(steps, 1))), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
