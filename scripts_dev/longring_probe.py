"""Measure the long-ring (DR) regime physics throughput vs the no-DR bench.

Under domain randomization the policy-obs latency is drawn from 0-80 ms
(reference train.py:116), so the substep snapshot ring must hold
latency_buffer_len rows and the obs blend reads the full ring
(SimConfig.obs_latency_taps auto -> full).  bench.py measures the no-DR
regime (2-row minimal ring).  This probe times the SAME rollout with
random_dynamics=True to quantify what the long-ring path costs:

  - megakernel writes all n substep snapshot rows (stack_rows == n)
  - ring_push long path: dynamic_update_slice into the (L, 31, B) ring
  - delayed_obs full-ring einsum (L taps)

Usage:  python scripts_dev/longring_probe.py [--num_envs 4096]
Prints one JSON line per regime.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp

from paddlerobotics_tpu.core.config import QuadrupedConfig
from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv


def bench_env(cfg, num_envs, steps=100, reps=4):
    env = BatchedQuadrupedEnv(cfg, num_envs=num_envs)
    state, obs = jax.jit(env.reset)(jax.random.key(0))

    def rollout(state):
        def body(s, _):
            ns, obs, rew, done, _ = env.step(s, jnp.zeros((num_envs, 12)))
            return ns, rew
        return jax.lax.scan(body, state, None, length=steps)

    rollout_j = jax.jit(rollout)
    s2, rews = rollout_j(state)
    jax.block_until_ready(rews)

    t0 = time.perf_counter()
    s = state
    for _ in range(reps):
        s, rews = rollout_j(s)
    jax.block_until_ready(rews)
    dt = time.perf_counter() - t0
    return num_envs * steps * reps / dt, env._hist_len


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=4096)
    ap.add_argument("--skip_nodr", action="store_true")
    args = ap.parse_args()

    base = QuadrupedConfig()
    base = dataclasses.replace(
        base, sim=dataclasses.replace(base.sim, use_pallas=True))

    results = {}
    if not args.skip_nodr:
        sps, L = bench_env(base, args.num_envs)
        results["no_dr"] = {"env_steps_per_s": round(sps, 1), "ring_len": L}
        print(json.dumps({"regime": "no_dr", **results["no_dr"]}),
              flush=True)

    dr_cfg = dataclasses.replace(
        base, random=dataclasses.replace(base.random, random_dynamics=True))
    sps, L = bench_env(dr_cfg, args.num_envs)
    results["dr_long_ring"] = {"env_steps_per_s": round(sps, 1),
                               "ring_len": L}
    print(json.dumps({"regime": "dr_long_ring", **results["dr_long_ring"]}),
          flush=True)

    if "no_dr" in results:
        ratio = (results["dr_long_ring"]["env_steps_per_s"] /
                 results["no_dr"]["env_steps_per_s"])
        print(json.dumps({"dr_over_nodr": round(ratio, 4)}), flush=True)


if __name__ == "__main__":
    main()
