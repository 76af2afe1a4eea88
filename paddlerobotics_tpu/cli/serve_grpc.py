"""Serve the proactive-greeting (bidi stream) and offline-eval (unary)
gRPC endpoints from an exported bundle — the jetson/run.sh role
(infer_v3 + eval_v3 servers) over REAL gRPC wire format
(hri/grpc_transport; method paths from proactive_greeting.proto /
eval_server.proto).

    python -m paddlerobotics_tpu.cli.serve_grpc --bundle bundle/ \
        [--port 9320] [--eval_port 9321] [--arch yolov4]

    # smoke mode: random-init params, no bundle needed
    python -m paddlerobotics_tpu.cli.serve_grpc --smoke --steps 1
"""

from __future__ import annotations

import argparse
import json
import time


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bundle", type=str, default="",
                   help="cli/export_hri_model bundle dir")
    p.add_argument("--smoke", action="store_true",
                   help="random-init params (no bundle): transport smoke")
    p.add_argument("--port", type=int, default=9320)
    p.add_argument("--eval_port", type=int, default=9321)
    p.add_argument("--arch", type=str, default="yolov4",
                   choices=("yolov4", "yolov3"))
    p.add_argument("--trigger_threshold", type=float, default=-1.0,
                   help="<0 = use the bundle's exported threshold")
    p.add_argument("--actions", type=str, default="",
                   help="multimodal_actions.txt for the salutation "
                        "catalog")
    p.add_argument("--steps", type=int, default=0,
                   help=">0 = self-drive N loopback frames then exit "
                        "(smoke validation); 0 = serve forever")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    import numpy as np

    from paddlerobotics_tpu.hri import export as export_mod
    from paddlerobotics_tpu.hri.attention_ctrl import AttnCtrlConfig
    from paddlerobotics_tpu.hri.grpc_transport import (EvalGrpcServer,
                                                       GreetingGrpcServer)
    from paddlerobotics_tpu.hri.perception.scene import SceneSensor
    from paddlerobotics_tpu.hri.serving import (ProactiveGreetingService,
                                                ServiceConfig)
    from paddlerobotics_tpu.hri.train_attention import AttentionTrainer

    if not args.bundle and not args.smoke:
        raise SystemExit("pass --bundle DIR or --smoke")

    threshold = args.trigger_threshold
    if args.smoke:
        # tokens_per_frame must match the real scene sensor's
        # MAX_INSTANCES (20) — the detector always emits 20 slots
        ctrl_cfg = AttnCtrlConfig(num_frames=4, tokens_per_frame=20,
                                  model_dim=64, num_decoder_blocks=1,
                                  num_heads=2, ffn_dim=128, num_actions=8)
        ctrl_params = AttentionTrainer(ctrl_cfg).init(
            jax.random.key(0)).params
        scene = SceneSensor(arch=args.arch)
        scene_params = scene.init(jax.random.key(1))
        if threshold < 0:
            threshold = 0.0          # random params: always trigger
    else:
        with open(f"{args.bundle}/manifest.json") as f:
            manifest = json.load(f)
        ctrl_cfg = AttnCtrlConfig(**manifest["ctrl_cfg"])
        tmpl = AttentionTrainer(ctrl_cfg).init(jax.random.key(0)).params
        scene = SceneSensor(arch=args.arch)
        scene_tmpl = (scene.init(jax.random.key(1))
                      if manifest.get("has_scene_params") else None)
        manifest, ctrl_cfg, ctrl_params, scene_params, _ = \
            export_mod.load_bundle(args.bundle, tmpl, scene_tmpl)
        if scene_params is None:
            scene_params = scene.init(jax.random.key(1))
        if threshold < 0:
            threshold = float(manifest.get("extra", {}).get(
                "trigger_threshold", 0.8))

    catalog = None
    if args.actions:
        from paddlerobotics_tpu.hri import actions as actions_mod
        catalog = []
        with open(args.actions) as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if parts and parts[0]:
                    catalog.append(actions_mod.MultimodalAction(
                        *(parts + ["null"] * 4)[:4]))

    # The online greeting stream and the offline eval endpoint each get
    # their OWN service instance (the jetson deployment runs infer_v3
    # and eval_v3 as separate processes): score_clip resets frame
    # windows, so sharing one mutable service would let an eval RPC
    # corrupt a concurrent greeting stream's window. Each instance is
    # additionally lock-guarded because both gRPC servers run a
    # multi-worker thread pool.
    import threading

    svc_cfg = ServiceConfig(num_frames=ctrl_cfg.num_frames,
                            tokens_per_frame=ctrl_cfg.tokens_per_frame,
                            trigger_threshold=threshold)
    svc = ProactiveGreetingService(
        svc_cfg, scene, scene_params, ctrl_cfg, ctrl_params,
        action_catalog=catalog)
    eval_svc = ProactiveGreetingService(
        svc_cfg, scene, scene_params, ctrl_cfg, ctrl_params,
        action_catalog=catalog)
    svc_lock = threading.Lock()
    eval_lock = threading.Lock()

    def process(img, lag_ms, wakeup):
        with svc_lock:
            d = svc.process_frame(img,
                                  timestamp=time.time() - lag_ms / 1e3)
        if wakeup:
            d["wakeup"] = wakeup
        return d

    def score_clip(frames):
        """Clip scoring per eval_v3.cpp: window the clip's frames
        through the service programs, report the last-step trigger.
        Each clip starts from an empty window (no state bleed from the
        online stream or previous clips)."""
        with eval_lock:
            eval_svc.token_window.clear()
            eval_svc.valid_window.clear()
            eval_svc.box_window.clear()
            eval_svc.last_trigger_time = -1e9
            last = {}
            for f in frames:
                last = eval_svc.process_frame(np.asarray(f))
        return {"response": last, "response_score":
                float(last.get("target_obj_score", 0.0)),
                "trigger_pred": float(last.get("trigger_score", 0.0)),
                "nullact_id": int(last.get("action_id", 0))}

    greet = GreetingGrpcServer(process, port=args.port).start()
    evals = EvalGrpcServer(score_clip, port=args.eval_port).start()
    print(f"ProactiveGreeting.infer on 127.0.0.1:{greet.port} | "
          f"EvalServer.infer on 127.0.0.1:{evals.port}", flush=True)

    if args.steps > 0:
        from paddlerobotics_tpu.hri.grpc_transport import (EvalGrpcClient,
                                                           GreetingGrpcClient)
        c = GreetingGrpcClient(f"127.0.0.1:{greet.port}")
        reqs = [c.video_request(i, np.zeros((416, 416, 3), np.float32))
                for i in range(args.steps)]
        for d in c.infer(iter(reqs)):
            print(json.dumps(d), flush=True)
        c.close()
        ec = EvalGrpcClient(f"127.0.0.1:{evals.port}")
        print(json.dumps(ec.infer(
            [np.zeros((416, 416, 3), np.float32)])), flush=True)
        ec.close()
        greet.stop(0)
        evals.stop(0)
        return

    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        greet.stop(0)
        evals.stop(0)


if __name__ == "__main__":
    main()
