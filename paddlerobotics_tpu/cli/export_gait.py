"""Gait-table export CLI (mirror of ETGRL/env_test.py:30-60): roll a
fixed ETG and save the (n,12) joint-residual table npy for deployment
replay."""

from __future__ import annotations

import argparse

import jax
import numpy as np

# Tiny host-side artifact job: force CPU so it doesn't pay minutes of
# remote-TPU compile latency for a (steps,12) table.
jax.config.update("jax_platforms", "cpu")

from paddlerobotics_tpu.core.config import QuadrupedConfig
from paddlerobotics_tpu.deploy.policy_export import export_gait_table
from paddlerobotics_tpu.etg import fit as etg_fit


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--load", type=str, default="",
                   help="npz with (w, b, param); default prior gait")
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--suffix", type=str, default="exp")
    p.add_argument("--save", type=int, default=1)
    p.add_argument("--task_mode", type=str, default="ground",
                   help="task the gait was trained for; 'gallop' "
                        "resolves pairing='auto' to the bound gait")
    args = p.parse_args(argv)

    import dataclasses

    cfg = QuadrupedConfig()
    cfg = dataclasses.replace(
        cfg, task=dataclasses.replace(cfg.task, task_mode=args.task_mode))
    if args.load:
        data = np.load(args.load)
        w, b = data["w"], data["b"]
    else:
        w, b = etg_fit.opt_with_points(cfg.etg)
    path = (f"gait_action_list_ETG_{args.suffix}.npy" if args.save else None)
    table = export_gait_table(cfg, w, b, n_steps=args.steps, path=path)
    print(f"gait table {table.shape}" + (f" → {path}" if path else ""))


if __name__ == "__main__":
    main()
