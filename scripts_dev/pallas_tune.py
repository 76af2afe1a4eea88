"""Megakernel block-size sweep: env-steps/s for pallas_block settings.

The pallas control-step kernel grids over env blocks (physics_step.py);
pallas_block trades VMEM residency per program vs grid parallelism.
Prints one line per setting; run on the real TPU.
"""

import dataclasses
import time

import jax
import jax.numpy as jnp

from paddlerobotics_tpu.core.config import QuadrupedConfig
from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv

NUM_ENVS = 4096
STEPS = 100
REPS = 4


def bench_block(blk: int) -> float:
    cfg = QuadrupedConfig()
    cfg = dataclasses.replace(
        cfg, sim=dataclasses.replace(cfg.sim, use_pallas=True,
                                     pallas_block=blk))
    env = BatchedQuadrupedEnv(cfg, num_envs=NUM_ENVS)
    state, obs = jax.jit(env.reset)(jax.random.key(0))

    def rollout(state):
        def body(s, _):
            ns, o, r, d, _ = env.step(s, jnp.zeros((NUM_ENVS, 12)))
            return ns, r
        return jax.lax.scan(body, state, None, length=STEPS)

    rollout_j = jax.jit(rollout)
    s2, rews = rollout_j(state)
    jax.block_until_ready(rews)
    t0 = time.perf_counter()
    s = state
    for _ in range(REPS):
        s, rews = rollout_j(s)
    jax.block_until_ready(rews)
    dt = time.perf_counter() - t0
    return NUM_ENVS * STEPS * REPS / dt


def main():
    for blk in (256, 512, 1024, 2048, 4096):
        try:
            sps = bench_block(blk)
            print(f"pallas_block={blk:5d}  {sps:,.0f} env steps/s",
                  flush=True)
        except Exception as e:
            print(f"pallas_block={blk:5d}  FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
