"""Export a trained attention controller (+ scene sensor) as a serving
bundle (rebuild of scripts/save_infer_model_params.py: fluid inference
programs → one deployable directory).

    python -m paddlerobotics_tpu.cli.export_hri_model \
        --ckpt attn_log/itr_100 --out bundle/ \
        [--darknet_cfg yolov4.cfg --darknet_weights yolov4.weights] \
        [--wae raw_wae.npy]
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True,
                   help="Orbax checkpoint dir (cli/train_attention itr_N)")
    p.add_argument("--out", required=True, help="bundle output dir")
    p.add_argument("--inputs_type", type=str, default="visual_token")
    p.add_argument("--num_actions", type=int, default=317)
    p.add_argument("--num_frames", type=int, default=10)
    p.add_argument("--tokens_per_frame", type=int, default=20)
    p.add_argument("--model_dim", type=int, default=512)
    p.add_argument("--num_decoder_blocks", type=int, default=6)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--ffn_dim", type=int, default=2048)
    p.add_argument("--darknet_cfg", type=str, default="",
                   help="darknet .cfg → export YOLO scene params too")
    p.add_argument("--darknet_weights", type=str, default="")
    p.add_argument("--wae", type=str, default="",
                   help="action embedding table .npy")
    p.add_argument("--trigger_threshold", type=float, default=0.8)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    import numpy as np

    from paddlerobotics_tpu.hri.attention_ctrl import AttnCtrlConfig
    from paddlerobotics_tpu.hri import export as export_mod
    from paddlerobotics_tpu.train import checkpoints

    cfg = AttnCtrlConfig(
        inputs_type=args.inputs_type, num_actions=args.num_actions,
        num_frames=args.num_frames,
        tokens_per_frame=args.tokens_per_frame, model_dim=args.model_dim,
        num_decoder_blocks=args.num_decoder_blocks,
        num_heads=args.num_heads, ffn_dim=args.ffn_dim)

    # template state for structure, then restore the checkpoint into it
    import jax.numpy as jnp

    from paddlerobotics_tpu.hri.train_attention import AttentionTrainer

    tmpl_state = AttentionTrainer(cfg).init(jax.random.key(0))
    try:
        restored = checkpoints.restore(args.ckpt, {
            "params": tmpl_state.params,
            "opt_state": tmpl_state.opt_state, "step": tmpl_state.step})
    except Exception:
        # legacy params-only checkpoint (pre opt_state/step format)
        restored = checkpoints.restore(args.ckpt,
                                       {"params": tmpl_state.params})
    ctrl_params = restored["params"]

    scene_params = None
    scene_meta = None
    if args.darknet_cfg:
        from paddlerobotics_tpu.hri.perception import darknet

        sections = darknet.parse_cfg(open(args.darknet_cfg).read())
        net = darknet.DarknetNet(sections)
        size = 416
        scene_params = net.init(jax.random.key(1),
                                jnp.zeros((1, size, size, 3)))
        if args.darknet_weights:
            scene_params = darknet.load_darknet_weights(
                scene_params, sections, args.darknet_weights)
        scene_meta = {"cfg": args.darknet_cfg,
                      "weights": args.darknet_weights}

    wae = np.load(args.wae) if args.wae else None
    export_mod.save_bundle(
        args.out, cfg, ctrl_params, scene_params=scene_params, wae=wae,
        scene_meta=scene_meta,
        extra={"trigger_threshold": args.trigger_threshold})
    print(f"bundle written to {args.out}")


if __name__ == "__main__":
    main()
