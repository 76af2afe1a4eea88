"""Sim-to-real dynamics identification CLI (mirror of ETGRL/
Dynamic_train.py): fit 48 normalized dynamics params so sim traces
match recorded robot logs."""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--gait", type=str, required=True,
                   help="npy of recorded joint commands (T,12)")
    p.add_argument("--real_q", type=str, required=True,
                   help="npy of recorded joint angles (T,12)")
    p.add_argument("--real_gyro", type=str, required=True,
                   help="npy of recorded gyro (T,3)")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--popsize", type=int, default=40)
    p.add_argument("--sigma", type=float, default=0.5)
    p.add_argument("--outdir", type=str, default="dyn_id_log")
    p.add_argument("--save", type=str, default="dynamic_param.npy")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from paddlerobotics_tpu.core.config import QuadrupedConfig
    from paddlerobotics_tpu.train.dynamics_id import DynamicsIdentifier

    ident = DynamicsIdentifier(
        QuadrupedConfig(), np.load(args.gait), np.load(args.real_q),
        np.load(args.real_gyro), popsize=args.popsize, sigma=args.sigma,
        outdir=args.outdir)
    best, dyn = ident.identify(epochs=args.epochs, seed=args.seed)
    np.save(args.save, np.asarray(best))   # Dynamic_parallel_model.py:150
    print(f"saved {args.save}")


if __name__ == "__main__":
    main()
