"""Fused rollout+learn throughput benchmark (the number a user feels).

`bench.py` reports the physics-only stepping rate; this CLI measures the
full training hot loop — policy forward, env step, replay write, and K
SAC gradient updates per batched step, all inside the jitted chunk
(train/etg_rl._make_rollout) — at the two shipped schedules:

    python -m paddlerobotics_tpu.cli.train_bench

prints one JSON line per schedule with steady-state env steps/s and the
derived per-update learner throughput. docs/perf.md holds the recorded
numbers and the roofline/MFU accounting.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp

from paddlerobotics_tpu.core.config import (ESConfig, QuadrupedConfig,
                                            SACConfig, TrainConfig)
from paddlerobotics_tpu.train.etg_rl import ETGRLTrainer

SCHEDULES = [
    # (tag, num_envs, updates_per_step)
    ("default_B4096_K4", 4096, 4),
    ("sample_efficient_B1024_K16", 1024, 16),
]


def bench_schedule(tag: str, B: int, K: int, chunk_steps: int,
                   iters: int, use_pallas: bool,
                   bf16: bool = False) -> dict:
    cfg = QuadrupedConfig(
        sim=dataclasses.replace(QuadrupedConfig().sim,
                                use_pallas=use_pallas),
        sac=SACConfig(warmup_steps=0, memory_size=100_000,
                      bf16_matmul=bf16),
        es=ESConfig(es_every_steps=10 ** 12),   # pure SAC loop
        train=TrainConfig(num_envs=B, eval_every_steps=10 ** 12),
    )
    tr = ETGRLTrainer(cfg, num_envs=B, outdir="/tmp/train_bench",
                      updates_per_step=K)
    rng = jax.random.key(0)
    k_env, k_sac = jax.random.split(rng)
    w, b = tr.fit_etg(jnp.zeros(cfg.es.num_params))
    w_env, b_env = tr._broadcast_etg(w, b)
    env_state, obs = jax.jit(tr.env.reset)(k_env, w_env, b_env)
    from paddlerobotics_tpu.algos import replay
    from paddlerobotics_tpu.train.etg_rl import TrainCarry

    buf = replay.create(cfg.sac.memory_size, tr.env.obs_dim,
                        tr.env.action_dim)
    carry = TrainCarry(env_state, obs, tr.sac.init(k_sac), buf, rng)

    # compile + warm the buffer
    carry, out = tr.rollout_chunk(carry, 600, chunk_steps, True)
    jax.block_until_ready(out["reward"])
    t0 = time.perf_counter()
    for _ in range(iters):
        carry, out = tr.rollout_chunk(carry, 600, chunk_steps, True)
    jax.block_until_ready(out["reward"])
    dt = time.perf_counter() - t0

    env_steps = iters * chunk_steps * B
    sps = env_steps / dt
    return {
        "schedule": tag, "num_envs": B, "updates_per_step": K,
        "env_steps_per_s": round(sps, 1),
        "grad_updates_per_s": round(iters * chunk_steps * K / dt, 1),
        "batch_rows_per_s": round(
            iters * chunk_steps * K * cfg.sac.batch_size / dt, 1),
        "wall_s": round(dt, 2),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--chunk_steps", type=int, default=50)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--use_pallas", type=int, default=None,
                   help="default: pallas on TPU, fused-XLA elsewhere")
    p.add_argument("--num_envs", type=int, default=0,
                   help="override: bench a single custom (B, K) point")
    p.add_argument("--updates_per_step", type=int, default=4)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 critic matmuls (SACConfig.bf16_matmul)")
    args = p.parse_args(argv)
    use_pallas = (jax.default_backend() == "tpu"
                  if args.use_pallas is None else bool(args.use_pallas))
    schedules = SCHEDULES if not args.num_envs else [
        (f"custom_B{args.num_envs}_K{args.updates_per_step}",
         args.num_envs, args.updates_per_step)]
    for tag, B, K in schedules:
        r = bench_schedule(tag, B, K, args.chunk_steps, args.iters,
                           use_pallas, bf16=args.bf16)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
