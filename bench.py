"""Benchmark: A1 env throughput at 4096 parallel envs on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
North star (BASELINE.json): ≥5M env steps/sec at 4096 envs on v5e-8,
i.e. 625k env steps/sec per chip.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from paddlerobotics_tpu.core.config import QuadrupedConfig
from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv

NUM_ENVS = 4096
BASELINE_STEPS_PER_SEC_PER_CHIP = 625_000.0  # 5M / 8 chips


def main():
    import dataclasses

    cfg = QuadrupedConfig()
    cfg = dataclasses.replace(
        cfg, sim=dataclasses.replace(cfg.sim, use_pallas=True))
    env = BatchedQuadrupedEnv(cfg, num_envs=NUM_ENVS)
    state, obs = jax.jit(env.reset)(jax.random.key(0))

    STEPS = 100

    def rollout(state):
        def body(s, _):
            ns, obs, rew, done, _ = env.step(s, jnp.zeros((NUM_ENVS, 12)))
            return ns, rew

        return jax.lax.scan(body, state, None, length=STEPS)

    rollout_j = jax.jit(rollout)
    s2, rews = rollout_j(state)          # warmup/compile
    jax.block_until_ready(rews)

    t0 = time.perf_counter()
    REPS = 4
    s = state
    for _ in range(REPS):
        s, rews = rollout_j(s)
    jax.block_until_ready(rews)
    dt = time.perf_counter() - t0

    sps = NUM_ENVS * STEPS * REPS / dt
    print(json.dumps({
        "metric": "a1_env_steps_per_sec_per_chip_4096envs",
        "value": round(sps, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC_PER_CHIP, 4),
    }))


if __name__ == "__main__":
    main()
