"""Ablation-fleet trainer (rebuild of scripts/parallel_train_attn.py).

The reference pins one input-variant trainer per CUDA place, all fed by
a shared decord reader + detector process pool (parallel_train_attn.py:
25-31, 225-247, 353-380). TPU-native: every variant trains in ONE
process — each variant's params live on their own device (round-robin
over jax.devices()), one host loop interleaves the jitted train steps,
and the "shared reader" is simply the same batch stream handed to all
variants (tokenization already happened on device).

    python -m paddlerobotics_tpu.cli.parallel_train_attn \
        --variants visual_token,instance,without_inst_fm \
        --synthetic 50 --epochs 2
"""

from __future__ import annotations

import argparse

# reference Config map (parallel_train_attn.py:25-31): variant →
# subdirectory; device pinning here is round-robin instead of a flag
VARIANTS = ("visual_token", "instance", "without_inst_fm",
            "without_inst_cls", "without_inst_pos")


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--variants", type=str,
                   default="visual_token,instance")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--num_actions", type=int, default=317)
    p.add_argument("--num_frames", type=int, default=10)
    p.add_argument("--tokens_per_frame", type=int, default=20)
    p.add_argument("--model_dim", type=int, default=512)
    p.add_argument("--num_decoder_blocks", type=int, default=6)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--ffn_dim", type=int, default=2048)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--l2", type=float, default=0.1)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--outdir", type=str, default="attn_fleet")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from paddlerobotics_tpu.hri.attention_ctrl import AttnCtrlConfig
    from paddlerobotics_tpu.hri.train_attention import AttentionTrainer
    from paddlerobotics_tpu.train import checkpoints, metrics as m

    names = [v.strip() for v in args.variants.split(",") if v.strip()]
    for v in names:
        if v not in VARIANTS:
            raise SystemExit(f"unknown variant {v!r} (choose from "
                             f"{', '.join(VARIANTS)})")

    devices = jax.devices()
    fleet = []
    for i, name in enumerate(names):
        cfg = AttnCtrlConfig(
            inputs_type=name, num_actions=args.num_actions,
            num_frames=args.num_frames,
            tokens_per_frame=args.tokens_per_frame,
            model_dim=args.model_dim,
            num_decoder_blocks=args.num_decoder_blocks,
            num_heads=args.num_heads, ffn_dim=args.ffn_dim)
        trainer = AttentionTrainer(cfg, lr=args.lr, weight_decay=args.l2)
        dev = devices[i % len(devices)]
        state = jax.device_put(trainer.init(jax.random.key(i)), dev)
        outdir = os.path.join(args.outdir, name)
        fleet.append((name, cfg, trainer, state, dev,
                      m.MetricsLogger(outdir, use_tensorboard=False)))

    from paddlerobotics_tpu.hri.train_attention import synthetic_batch

    rng = np.random.RandomState(0)

    def npz_batches():
        """Shared real-data stream (the reference's one decord reader
        feeding every variant's queue, parallel_train_attn.py:353-380):
        each .npz window file carries ALL token keys; _tokens() selects
        per variant."""
        import glob

        files = sorted(glob.glob(os.path.join(args.data_dir, "*.npz")))
        for i in range(0, len(files) - args.batch_size + 1,
                       args.batch_size):
            arrs = [np.load(f) for f in files[i:i + args.batch_size]]
            yield {k: jnp.asarray(np.stack([a[k] for a in arrs]))
                   for k in arrs[0].files}

    step = 0
    last_loss = {}
    for epoch in range(args.epochs):
        if args.data_dir:
            batches = npz_batches()
        else:
            batches = (synthetic_batch(fleet[0][1], rng, args.batch_size)
                       for _ in range(max(args.synthetic, 1)))
        for shared in batches:
            step += 1
            # interleave: dispatch every variant's step first (async on
            # its own device), only then touch the losses — the fleet
            # overlaps instead of serializing on per-step float()
            auxes = []
            for i, (name, cfg, trainer, state, dev, logger) in \
                    enumerate(fleet):
                if args.data_dir or cfg.inputs_type == \
                        fleet[0][1].inputs_type:
                    batch = shared     # _tokens() selects per variant
                else:
                    batch = synthetic_batch(cfg, rng, args.batch_size)
                batch = jax.device_put(batch, dev)
                state, aux = trainer.train_step(state, batch)
                fleet[i] = (name, cfg, trainer, state, dev, logger)
                auxes.append((name, logger, aux))
            if step % 10 == 0 or args.synthetic:
                for name, logger, aux in auxes:
                    last_loss[name] = float(aux["loss"])
                    logger.add_scalar("train/loss", last_loss[name],
                                      step)
        for name, cfg, trainer, state, dev, logger in fleet:
            checkpoints.save(os.path.join(args.outdir, name), {
                "params": state.params, "opt_state": state.opt_state,
                "step": state.step}, step)
        print(f"epoch {epoch}: " + "  ".join(
            f"{name}={last_loss.get(name, float('nan')):.4f}"
            for name, *_ in fleet))


if __name__ == "__main__":
    main()
