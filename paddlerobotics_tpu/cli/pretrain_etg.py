"""ES-only ETG pretraining CLI (mirror of ETGRL/pretrain.py)."""

from __future__ import annotations

import argparse

import numpy as np

from paddlerobotics_tpu.cli.train_quadruped import build_parser, \
    config_from_args
from paddlerobotics_tpu.train.pretrain import ETGPretrainer


def main(argv=None):
    p = build_parser()
    p.add_argument("--generations", type=int, default=100)
    p.add_argument("--save_path", type=str, default="etg_pretrained.npz")
    p.add_argument("--alive_bonus", type=float, default=1.0,
                   help="per-step survival bonus added to the ES fitness "
                        "(see train/pretrain.py docstring)")
    args = p.parse_args(argv)
    cfg = config_from_args(args)
    trainer = ETGPretrainer(cfg, num_envs=max(args.num_envs, args.popsize),
                            outdir=args.outdir, alive_bonus=args.alive_bonus)
    best, best_r, (w, b) = trainer.train(generations=args.generations,
                                         seed=args.seed)
    # artifact layout mirrors train.py:301: npz with (w, b, param)
    np.savez(args.save_path, w=np.asarray(w), b=np.asarray(b),
             param=np.asarray(best))
    print(f"best fitness {best_r:.2f} → {args.save_path}")


if __name__ == "__main__":
    main()
