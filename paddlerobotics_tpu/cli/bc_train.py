"""BC distillation CLI (mirror of ETGRL/BCtrain.py).

Loads an expert SAC checkpoint (a task-matrix artifact: SAC state +
ETG params, as saved by cli.eval_matrix --train), rolls the STUDENT to
collect paired (student_obs, expert_obs) transitions, distills the
truncated/noised student (cal_agent_obs, BCtrain.py:77-81), and reports
the reference's headline metric: the student/expert deterministic
eval-reward ratio ("ref_ratio", BCtrain.py:183-186).

    python -m paddlerobotics_tpu.cli.bc_train --task ground \
        --expert_dir /tmp/matrix/ground --outdir /tmp/bc_ground \
        --bc_steps 200000 --obs2noise 1
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--task", type=str, default="ground")
    p.add_argument("--expert_dir", type=str, required=True,
                   help="task-matrix checkpoint dir (contains itr_*)")
    p.add_argument("--outdir", type=str, default="bc_log")
    p.add_argument("--num_envs", type=int, default=256)
    p.add_argument("--bc_steps", type=int, default=200_000)
    p.add_argument("--distill_epochs", type=int, default=10)
    p.add_argument("--final_epochs", type=int, default=10)
    p.add_argument("--eval_steps", type=int, default=600)
    p.add_argument("--obs2noise", type=int, default=0,
                   help="apply BCtrain.py:53-58 sensor noise to the "
                        "student view (collection AND eval)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from paddlerobotics_tpu.algos.sac import SAC
    from paddlerobotics_tpu.cli.eval_matrix import build_task_config
    from paddlerobotics_tpu.etg import fit as etg_fit
    from paddlerobotics_tpu.train import checkpoints
    from paddlerobotics_tpu.train.bc_train import BCTrainer

    cfg, _, _ = build_task_config(
        args.task, eval_steps=args.eval_steps,
        use_pallas=jax.default_backend() == "tpu")

    step = checkpoints.latest_step(args.expert_dir)
    if step is None:
        raise FileNotFoundError(
            f"no itr_* checkpoint under {args.expert_dir} — train the "
            f"expert first (cli.eval_matrix --train)")
    expert = SAC(cfg.sensors.base_obs_dim, 12, cfg.sac)
    expert_state = expert.init(jax.random.key(0))
    restored = checkpoints.restore(
        os.path.join(args.expert_dir, f"itr_{step}"), {
            "sac": expert_state._asdict(),
            "etg_w": jnp.zeros((3, cfg.etg.H)),
            "etg_b": jnp.zeros(3),
            "etg_param": jnp.zeros(cfg.es.num_params)})
    expert_state = type(expert_state)(**restored["sac"])
    # refit the expert's gait exactly as the matrix evaluator does
    # (ETGRLTrainer.fit_etg: prior points + 12-param offsets → proximal LS)
    prior = jnp.asarray(etg_fit.prior_points(cfg.etg))
    w0, b0 = etg_fit.opt_with_points(cfg.etg)
    pts = prior + jnp.asarray(restored["etg_param"]).reshape(6, 2)
    w, b = etg_fit.opt_with_points(cfg.etg, points=pts, w0=w0, b0=b0)

    trainer = BCTrainer(cfg, expert, expert_state, etg_w=w, etg_b=b,
                        num_envs=args.num_envs, outdir=args.outdir,
                        sensor_noise=bool(args.obs2noise))
    bc_state, losses = trainer.train(total_steps=args.bc_steps,
                                     distill_epochs=args.distill_epochs,
                                     final_epochs=args.final_epochs,
                                     seed=args.seed)
    checkpoints.save(args.outdir, {"bc": bc_state._asdict()}, args.bc_steps)
    row = {"task": args.task, "bc_steps": args.bc_steps,
           "obs2noise": args.obs2noise,
           "actor_loss": round(float(losses["actor_loss"]), 4),
           "critic_loss": round(float(losses["critic_loss"]), 4)}
    row.update(trainer.ratio_report(bc_state, args.eval_steps))
    with open(os.path.join(args.outdir, "bc_result.json"), "w") as f:
        json.dump(row, f, indent=1)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
