"""BC distillation CLI (mirror of ETGRL/BCtrain.py).

Loads an expert SAC checkpoint, rolls it to collect paired
(student_obs, expert_obs), and distills a student that sees the
truncated/noised view (cal_agent_obs, BCtrain.py:77-81).
"""

from __future__ import annotations

import argparse

from paddlerobotics_tpu.cli.train_quadruped import build_parser, \
    config_from_args


def main(argv=None):
    p = build_parser()
    p.add_argument("--bc_steps", type=int, default=50_000)
    p.add_argument("--distill_epochs", type=int, default=10)
    p.add_argument("--obs2noise", type=int, default=0,
                   help="apply sensor noise to the student view")
    args = p.parse_args(argv)
    cfg = config_from_args(args)

    import jax

    from paddlerobotics_tpu.algos.sac import SAC
    from paddlerobotics_tpu.train import checkpoints
    from paddlerobotics_tpu.train.bc_train import BCTrainer

    expert = SAC(cfg.sensors.base_obs_dim, 12, cfg.sac)
    expert_state = expert.init(jax.random.key(0))
    if args.load:
        tpl = {"sac": expert_state._asdict()}
        restored = checkpoints.restore(args.load, tpl)
        expert_state = type(expert_state)(**restored["sac"])

    trainer = BCTrainer(cfg, expert, expert_state,
                        num_envs=min(args.num_envs, 512),
                        outdir=args.outdir,
                        sensor_noise=bool(args.obs2noise))
    bc_state, losses = trainer.train(total_steps=args.bc_steps,
                                     distill_epochs=args.distill_epochs,
                                     seed=args.seed)
    checkpoints.save(args.outdir, {"bc": bc_state._asdict()}, args.bc_steps)
    print(f"BC done: actor_loss {float(losses['actor_loss']):.4f}")


if __name__ == "__main__":
    main()
