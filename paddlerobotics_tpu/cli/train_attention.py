"""Attention-controller training CLI (mirror of
scripts/train_attention_controller.py's argparse surface).

Trains on tokenized windows. Data can come from (a) a directory of
pre-tokenized .npz window files (produced by the data pipeline), or
(b) `--synthetic N` batches for smoke/benchmark runs.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic batches (smoke/bench)")
    p.add_argument("--inputs_type", type=str, default="visual_token")
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
    p.add_argument("--outdir", type=str, default="attn_log")
    p.add_argument("--use_pallas_attention", type=int, default=0)
    p.add_argument("--distributed", type=int, default=0,
                   help="shard batches over the device mesh")
    p.add_argument("--init_params", type=str, default="",
                   help="checkpoint dir (itr_N) to resume from — the "
                   "reference's --init_params + tb_state counter "
                   "(train_attention_controller.py:417-437)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp

    from paddlerobotics_tpu.hri.attention_ctrl import AttnCtrlConfig
    from paddlerobotics_tpu.hri.train_attention import AttentionTrainer
    from paddlerobotics_tpu.train import checkpoints, metrics as m

    cfg = AttnCtrlConfig(
        inputs_type=args.inputs_type, num_actions=args.num_actions,
        num_frames=args.num_frames, tokens_per_frame=args.tokens_per_frame,
        model_dim=args.model_dim,
        num_decoder_blocks=args.num_decoder_blocks,
        num_heads=args.num_heads, ffn_dim=args.ffn_dim)
    mesh = None
    if args.distributed:
        from paddlerobotics_tpu.parallel import sharding as sh

        mesh = sh.make_mesh(n_model=1)
    trainer = AttentionTrainer(cfg, lr=args.lr, weight_decay=args.l2,
                               mesh=mesh)
    state = trainer.init(jax.random.key(0))
    if args.init_params:
        restored = checkpoints.restore(args.init_params, {
            "params": state.params, "opt_state": state.opt_state,
            "step": state.step})
        state = type(state)(restored["params"], restored["opt_state"],
                            jnp.asarray(restored["step"]))
        print(f"resumed from {args.init_params} at step "
              f"{int(state.step)}")
    logger = m.MetricsLogger(args.outdir, use_tensorboard=False)

    from paddlerobotics_tpu.hri.train_attention import \
        synthetic_batch as make_synth

    rng = np.random.RandomState(0)

    def synthetic_batch():
        return make_synth(cfg, rng, args.batch_size)

    def npz_batches():
        files = sorted(glob.glob(os.path.join(args.data_dir, "*.npz")))
        for i in range(0, len(files) - args.batch_size + 1,
                       args.batch_size):
            arrs = [np.load(f) for f in files[i:i + args.batch_size]]
            yield {k: jnp.asarray(np.stack([a[k] for a in arrs]))
                   for k in arrs[0].files}

    step = int(state.step)
    for epoch in range(args.epochs):
        batches = ([synthetic_batch() for _ in range(args.synthetic)]
                   if args.synthetic else npz_batches())
        for batch in batches:
            if mesh is not None:
                batch = trainer.shard_batch(batch)
            state, aux = trainer.train_step(state, batch)
            step += 1
            if step % 10 == 0 or args.synthetic:
                logger.add_scalar("train/loss", float(aux["loss"]), step)
                logger.add_scalar("train/trigger_loss",
                                  float(aux["trigger_loss"]), step)
        checkpoints.save(args.outdir, {
            "params": state.params, "opt_state": state.opt_state,
            "step": state.step}, step)
        print(f"epoch {epoch} loss {float(aux['loss']):.4f}")


if __name__ == "__main__":
    main()
