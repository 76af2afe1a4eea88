"""HRI attention-controller convergence study (round-4 VERDICT item 2).

Trains the attention controller to convergence on the learnable
synthetic scene stream (hri/synthetic_scene.py) for two input variants,
then runs the reference's deployment-threshold workflow
(jetson/parallel_eval.py:28-33): threshold sweep → precision/recall →
per-variant operating threshold. The visual_token variant's scores are
additionally cross-checked through the NATIVE C++ eval server
(runtime_cpp eval_server.cpp, the eval_v3.cpp equivalent) so the swept
operating point is validated on the serving path end to end.

Writes /tmp/hri_convergence/{variant}/metrics.jsonl + summary.json;
docs/hri_training.md is authored from the summary.

Usage: python scripts_dev/hri_convergence.py [variants=visual_token,inst_crop]
           [steps=4000] [batch=64]
"""

import functools
import json
import os
import sys
import time

import numpy as np


def auc_score(scores: np.ndarray, labels: np.ndarray) -> float:
    o = np.argsort(scores)
    r = np.empty(len(scores), float)
    r[o] = np.arange(len(scores))
    npos = labels.sum()
    nneg = (1 - labels).sum()
    if npos == 0 or nneg == 0:
        return float("nan")
    return float((r[labels > 0.5].sum() - npos * (npos - 1) / 2)
                 / (npos * nneg))


def make_cfg(variant: str):
    from paddlerobotics_tpu.hri.attention_ctrl import AttnCtrlConfig
    # serving-size controller (attention_ctrl.py defaults: 512 dim,
    # 6 blocks, 8 heads, 2048 ffn, 10×20 window); num_actions = the
    # synthetic action space (salutation band × approach speed + null)
    return AttnCtrlConfig(inputs_type=variant, num_actions=8,
                          num_frames=10, tokens_per_frame=20,
                          model_dim=512, num_decoder_blocks=6,
                          num_heads=8, ffn_dim=2048)


CHUNK = 250     # train steps per device dispatch (= the eval cadence)

# instance-family eval: generated ON DEVICE in fixed-key chunks — an
# inst_fm window is ~10 MB, so a 512-window numpy eval set would ship
# ~5 GB over the remote tunnel; fixed keys make the set deterministic
EV_CHUNK, EV_NCHUNKS = 64, 8


def train_variant_device_eval(variant: str, steps: int, batch: int,
                              outroot: str):
    """Train an INSTANCE-family ablation (parallel_train_attn.py:25-31)
    with the held-out eval generated on device in fixed-key chunks.
    Returns (cfg, state, curve, scores, labels)."""
    import jax
    import jax.numpy as jnp

    from paddlerobotics_tpu.hri import synthetic_scene as ss
    from paddlerobotics_tpu.hri.train_attention import AttentionTrainer
    from paddlerobotics_tpu.train import checkpoints, metrics as m

    cfg = make_cfg(variant)
    outdir = os.path.join(outroot, variant)
    os.makedirs(outdir, exist_ok=True)
    logger = m.MetricsLogger(outdir, use_tensorboard=False)
    tr = AttentionTrainer(cfg, lr=1e-4, weight_decay=0.1)
    state = tr.init(jax.random.key(0))
    protos_dev = ss.device_prototypes(cfg)

    @jax.jit
    def eval_chunk(params, key):
        b = ss.generate_windows_device(key, EV_CHUNK, cfg, protos_dev)
        out = tr.model.apply(params, tr._tokens(b), b["frame_ids"],
                             b["padding_mask"])
        return (jax.nn.sigmoid(out["trigger_logits"][:, -1]),
                b["has_act"][:, -1])

    def eval_all(params):
        sc, lb = [], []
        for j in range(EV_NCHUNKS):
            s, l = eval_chunk(params, jax.random.key(7_000_000 + j))
            sc.append(np.asarray(s))
            lb.append(np.asarray(l))
        return np.concatenate(sc), np.concatenate(lb)

    ck = checkpoints.latest_step(outdir)
    if ck == steps:
        restored = checkpoints.restore(
            os.path.join(outdir, f"itr_{ck}"), {"params": state.params})
        state = state._replace(params=restored["params"])
        curve = []
        for line in open(os.path.join(outdir, "metrics.jsonl")):
            d = json.loads(line)
            if d["tag"] == "train/auc":
                curve.append({"step": d["step"], "auc": d["value"]})
        scores, labels = eval_all(state.params)
        print(f"resumed {variant} from itr_{ck}", flush=True)
        return cfg, state, curve, scores, labels

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_chunk(st, key):
        def body(s, k):
            b = ss.generate_windows_device(k, batch, cfg, protos_dev)
            return tr.train_step(s, b)
        st, auxs = jax.lax.scan(body, st, jax.random.split(key, CHUNK))
        return st, jax.tree.map(lambda x: x[-1], auxs)

    t0 = time.time()
    curve = []
    scores = labels = None
    for step in range(CHUNK, steps + 1, CHUNK):
        state, aux = train_chunk(state, jax.random.key(step))
        scores, labels = eval_all(state.params)
        auc = auc_score(scores, labels)
        row = {"step": step, "loss": float(aux["loss"]),
               "trigger_loss": float(aux["trigger_loss"]),
               "act_loss": float(aux["act_loss"]),
               "auc": round(auc, 4),
               "wall_s": round(time.time() - t0, 1)}
        curve.append(row)
        for k, v in row.items():
            if k != "step":
                logger.add_scalar(f"train/{k}", v, step)
        print(json.dumps({"variant": variant, **row}), flush=True)
    checkpoints.save(outdir, {"params": state.params}, steps)
    return cfg, state, curve, scores, labels


def train_variant(variant: str, steps: int, batch: int, outroot: str):
    import jax
    import jax.numpy as jnp

    from paddlerobotics_tpu.hri import synthetic_scene as ss
    from paddlerobotics_tpu.hri.train_attention import AttentionTrainer
    from paddlerobotics_tpu.train import checkpoints, metrics as m

    cfg = make_cfg(variant)
    outdir = os.path.join(outroot, variant)
    os.makedirs(outdir, exist_ok=True)
    logger = m.MetricsLogger(outdir, use_tensorboard=False)
    # reference optimizer: Adam + L2(0.1) (train_attention_controller.py)
    tr = AttentionTrainer(cfg, lr=1e-4, weight_decay=0.1)
    state = tr.init(jax.random.key(0))

    ev = ss.generate_windows(np.random.RandomState(10_000), 512, cfg)
    evj = {k: jnp.asarray(v) for k, v in ev.items()}
    ev_labels = np.asarray(ev["has_act"][:, -1])

    # resume: a finished checkpoint short-circuits retraining (the
    # sweep/crosscheck stages can then be re-run cheaply)
    ck = checkpoints.latest_step(outdir)
    if ck == steps:
        restored = checkpoints.restore(
            os.path.join(outdir, f"itr_{ck}"), {"params": state.params})
        state = state._replace(params=restored["params"])
        curve = []
        for line in open(os.path.join(outdir, "metrics.jsonl")):
            d = json.loads(line)
            if d["tag"] == "train/auc":
                curve.append({"step": d["step"], "auc": d["value"]})
        print(f"resumed {variant} from itr_{ck} "
              f"(final auc {curve[-1]['auc'] if curve else '?'})",
              flush=True)
        return cfg, state, curve, ev, ev_labels

    # eval batch passed as an ARGUMENT, not a closure capture — a
    # captured batch becomes HLO constants (inst_crop: ~580 MB) and
    # blows the remote-compile request limit (HTTP 413)
    @jax.jit
    def eval_scores(params, evb):
        out = tr.model.apply(params, tr._tokens(evb), evb["frame_ids"],
                             evb["padding_mask"])
        return jax.nn.sigmoid(out["trigger_logits"][:, -1])

    # the feed is generated ON DEVICE inside one scanned chunk per
    # dispatch — zero steady-state host→device traffic (the numpy
    # generator's 29 MB/step batch transfer was the wall on the
    # remote-attached chip; the numpy path still produces the held-out
    # eval windows above, so convergence doubles as a cross-generator
    # distribution check)
    protos_dev = ss.device_prototypes(cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_chunk(st, key):
        def body(s, k):
            b = ss.generate_windows_device(k, batch, cfg, protos_dev)
            return tr.train_step(s, b)
        st, auxs = jax.lax.scan(body, st,
                                jax.random.split(key, CHUNK))
        return st, jax.tree.map(lambda x: x[-1], auxs)

    t0 = time.time()
    curve = []
    for step in range(CHUNK, steps + 1, CHUNK):
        state, aux = train_chunk(state, jax.random.key(step))
        scores = np.asarray(eval_scores(state.params, evj))
        auc = auc_score(scores, ev_labels)
        row = {"step": step, "loss": float(aux["loss"]),
               "trigger_loss": float(aux["trigger_loss"]),
               "act_loss": float(aux["act_loss"]),
               "auc": round(auc, 4),
               "wall_s": round(time.time() - t0, 1)}
        curve.append(row)
        for k, v in row.items():
            if k != "step":
                logger.add_scalar(f"train/{k}", v, step)
        print(json.dumps({"variant": variant, **row}), flush=True)
    checkpoints.save(outdir, {"params": state.params}, steps)
    return cfg, state, curve, ev, ev_labels


def sweep(variant: str, cfg, state, ev, ev_labels):
    """Threshold sweep via the python serving program (eval_client) and,
    for visual_token, cross-checked through the native C++ eval server."""
    import jax
    import jax.numpy as jnp

    from paddlerobotics_tpu.hri.eval_client import OfflineEvaluator

    F, K = cfg.num_frames, cfg.tokens_per_frame
    N = ev["has_act"].shape[0]

    if variant == "visual_token":
        from paddlerobotics_tpu.hri.perception.scene import SceneSensor
        from paddlerobotics_tpu.hri.serving import (ProactiveGreetingService,
                                                    ServiceConfig)
        scene = SceneSensor(arch="yolov4")
        svc = ProactiveGreetingService(
            ServiceConfig(num_frames=F, tokens_per_frame=K,
                          trigger_threshold=0.8),
            scene, scene.init(jax.random.key(1)), cfg, state.params)
        evaluator = OfflineEvaluator(svc)
        tok = np.asarray(ev["visual_tokens"]).reshape(N, F, K, -1)
        val = np.asarray(ev["padding_mask"]).reshape(N, F, K)
        scores = evaluator.score_windows(tok, val)
    else:
        from paddlerobotics_tpu.hri.train_attention import AttentionTrainer
        tr = AttentionTrainer(cfg)
        evj = {k: jnp.asarray(v) for k, v in ev.items()}

        @jax.jit
        def score_fn(params, evb):
            out = tr.model.apply(params, tr._tokens(evb),
                                 evb["frame_ids"], evb["padding_mask"])
            return jax.nn.sigmoid(out["trigger_logits"][:, -1])

        scores = np.asarray(score_fn(state.params, evj))
        evaluator = OfflineEvaluator(None)

    rows = evaluator.sweep_thresholds(scores, ev_labels,
                                      thresholds=np.arange(0.5, 0.96, 0.05))
    # operating point: the reference deploys per-variant thresholds in
    # 0.65-0.9 — pick the highest-recall threshold with precision ≥ 0.95
    ok = [r for r in rows if r["precision"] >= 0.95]
    chosen = (max(ok, key=lambda r: r["recall"]) if ok
              else max(rows, key=lambda r: r["f1"]))
    return scores, rows, chosen


def native_crosscheck(cfg, state, ev, scores_direct, n_check: int = 48):
    """Replay held-out windows through the C++ eval server: the trained
    attend program behind the native window assembly + transport."""
    import jax
    import jax.numpy as jnp

    from paddlerobotics_tpu.hri.native_pipeline import NativeEvalServer
    from paddlerobotics_tpu.hri.stream_client import EvalStreamClient
    from paddlerobotics_tpu.hri.train_attention import AttentionTrainer

    F, K = cfg.num_frames, cfg.tokens_per_frame
    tok = np.asarray(ev["visual_tokens"]).reshape(-1, F, K, 562)
    val = np.asarray(ev["padding_mask"]).reshape(-1, F, K)
    tr = AttentionTrainer(cfg)

    @jax.jit
    def attend_fn(tokens, valid):
        T = F * K
        batch_tokens = tokens.reshape(1, T, 562)
        fids = jnp.repeat(jnp.arange(1, F + 1), K)[None]
        out = tr.model.apply(state.params,
                             {"visual_tokens": batch_tokens},
                             fids, valid.reshape(1, T))
        trig = jax.nn.sigmoid(out["trigger_logits"][0, -1])
        obj = jax.nn.sigmoid(out["obj_logits"][0, -K:])
        acts = jax.nn.softmax(out["act_logits"][0, -1])
        return trig, obj, acts

    current = {"w": 0}

    def detect(img):
        w = int(round(float(img[0, 0, 0]) * 1000))
        f = int(round(float(img[0, 0, 1]) * 100))
        keep = val[w, f] > 0.5
        feats = tok[w, f][keep].astype(np.float32)
        nk = int(keep.sum())
        boxes = np.tile(np.array([[100, 20, 200, 380]], np.float32),
                        (nk, 1))
        # 4th output = per-instance VALID flags (capi DetectFn)
        return (boxes, np.full(nk, 0.9, np.float32), feats,
                np.ones(nk, np.int32))

    def attend(tokens, valid):
        trig, obj, acts = attend_fn(jnp.asarray(tokens),
                                    jnp.asarray(valid))
        acts = np.asarray(acts)
        return float(trig), np.asarray(obj), int(acts.argmax()), acts

    # warm the jit before the socket loop: the first attend call
    # compiles over the remote tunnel (minutes), far beyond any sane
    # transport timeout
    attend_fn(jnp.zeros((F, K, 562)), jnp.ones((F, K)))

    server = NativeEvalServer(detect, attend, num_act=cfg.num_actions,
                              trigger_threshold=0.8)
    client = EvalStreamClient(port=server.port, timeout=120.0)
    native_scores = []
    try:
        for w in range(n_check):
            frames = []
            for f in range(F):
                img = np.zeros((416, 416, 3), np.float32)
                img[0, 0, 0] = w / 1000.0
                img[0, 0, 1] = f / 100.0
                frames.append(img)
            out = client.infer(frames)
            native_scores.append(out["trigger_pred"])
    finally:
        client.close()
        server.close()
    native_scores = np.asarray(native_scores)
    diff = float(np.max(np.abs(native_scores - scores_direct[:n_check])))
    return native_scores, diff


def main():
    variants = ["visual_token", "inst_crop"]
    steps, batch = 4000, 64
    for a in sys.argv[1:]:
        if a.startswith("variants="):
            variants = a.split("=", 1)[1].split(",")
        elif a.startswith("steps="):
            steps = int(a.split("=", 1)[1])
        elif a.startswith("batch="):
            batch = int(a.split("=", 1)[1])
    outroot = "/tmp/hri_convergence"
    os.makedirs(outroot, exist_ok=True)
    from paddlerobotics_tpu.hri.synthetic_scene import INSTANCE_FAMILY

    summary = []
    for variant in variants:
        print(f"=== {variant} ===", flush=True)
        if variant in INSTANCE_FAMILY:
            from paddlerobotics_tpu.hri.eval_client import OfflineEvaluator
            # inst_fm batches are ~10 MB/window — cap the fm variants'
            # train batch so the scanned feed fits comfortably in HBM
            vb = batch if variant == "without_inst_fm" else min(batch, 32)
            cfg, state, curve, scores, ev_labels = train_variant_device_eval(
                variant, steps, vb, outroot)
            rows = OfflineEvaluator(None).sweep_thresholds(
                scores, ev_labels, thresholds=np.arange(0.5, 0.96, 0.05))
            ok = [r for r in rows if r["precision"] >= 0.95]
            chosen = (max(ok, key=lambda r: r["recall"]) if ok
                      else max(rows, key=lambda r: r["f1"]))
            entry = {"variant": variant, "curve": curve,
                     "final_auc": curve[-1]["auc"], "sweep": rows,
                     "chosen_threshold": chosen,
                     "pos_frac": round(float(ev_labels.mean()), 4)}
            summary.append(entry)
            print(json.dumps({k: v for k, v in entry.items()
                              if k != "curve"}), flush=True)
            with open(os.path.join(outroot, "summary.json"), "w") as f:
                json.dump(summary, f, indent=1)
            continue
        cfg, state, curve, ev, ev_labels = train_variant(
            variant, steps, batch, outroot)
        scores, rows, chosen = sweep(variant, cfg, state, ev, ev_labels)
        entry = {"variant": variant, "curve": curve,
                 "final_auc": curve[-1]["auc"], "sweep": rows,
                 "chosen_threshold": chosen,
                 "pos_frac": round(float(ev_labels.mean()), 4)}
        if variant == "visual_token":
            native_scores, diff = native_crosscheck(cfg, state, ev, scores)
            entry["native_max_score_diff"] = diff
            print(f"native eval server max |score diff| = {diff:.2e}",
                  flush=True)
        summary.append(entry)
        print(json.dumps({k: v for k, v in entry.items()
                          if k != "curve"}), flush=True)
        with open(os.path.join(outroot, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
