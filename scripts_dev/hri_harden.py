"""Shift-hardened HRI training arm (round-5 shift study).

The baseline shift eval (scripts_dev/hri_shift_eval.py) measures how
the variants trained on the NOMINAL scene distribution degrade under
ten shifted families. This arm retrains the deployed visual_token
variant with the training distribution itself broadened over the
device generator's shift subset (synthetic_scene.generate_windows_device
``shift`` knobs: h0 range, rate scale, facing prior) by CYCLING the
scanned train chunks through five shift settings — each setting is one
static jit specialization, so hardening costs a handful of compiles
and zero steady-state host traffic, same as the nominal stream.

Then the same ten-family eval runs, with the hardened model's
operating threshold re-chosen on its own in-distribution held-out set
(P>=0.95 rule — the reference's deployment workflow,
jetson/parallel_eval.py:28-33), and every family scored AT that
threshold: the deployed quantity.

    python scripts_dev/hri_harden.py [steps=4000] [batch=64] [n=512]

Writes /tmp/hri_harden/ checkpoints + appends the hardened rows to
docs/hri_shift_summary.json (tag "visual_token_hardened").
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts_dev.hri_convergence import auc_score, make_cfg
from scripts_dev.hri_shift_eval import FAMILIES

# training-side shift settings cycled chunk-by-chunk (device subset of
# DEFAULT_SHIFT). Chosen to SPAN the eval families, not equal them:
# h0 widened to (30, 300) covers near_spawn/far_small (and breaks the
# baseline's spurious big-box==trigger shortcut — the near_spawn
# collapse), rate 0.5/1.8 covers slow/fast, facing 0.4 moves the
# trigger prior, app_noise 0.5 covers the appearance-jitter family.
HARDEN_SHIFTS = [
    {},                                              # nominal
    {"h0_range": (30.0, 300.0)},                     # size regime
    {"rate_scale": 1.8},                             # fast approach
    {"rate_scale": 0.5},                             # slow approach
    {"facing_p": 0.4},                               # trigger-rate
    {"app_noise": 0.5},                              # appearance jitter
]

CHUNK = 250


def train_hardened(steps: int, batch: int, outdir: str):
    import jax

    from paddlerobotics_tpu.hri import synthetic_scene as ss
    from paddlerobotics_tpu.hri.train_attention import AttentionTrainer
    from paddlerobotics_tpu.train import checkpoints

    cfg = make_cfg("visual_token")
    os.makedirs(outdir, exist_ok=True)
    tr = AttentionTrainer(cfg, lr=1e-4, weight_decay=0.1)
    state = tr.init(jax.random.key(0))
    protos_dev = ss.device_prototypes(cfg)

    ck = checkpoints.latest_step(outdir)
    if ck == steps:
        restored = checkpoints.restore(
            os.path.join(outdir, f"itr_{ck}"), {"params": state.params})
        state = state._replace(params=restored["params"])
        print(f"resumed hardened from itr_{ck}", flush=True)
        return cfg, tr, state

    # one jit specialization per shift setting (shift_t is static)
    def make_chunk(shift):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_chunk(st, key):
            def body(s, k):
                b = ss.generate_windows_device(k, batch, cfg, protos_dev,
                                               shift=shift or None)
                return tr.train_step(s, b)
            st, auxs = jax.lax.scan(body, st, jax.random.split(key, CHUNK))
            return st, jax.tree.map(lambda x: x[-1], auxs)
        return train_chunk

    chunks = [make_chunk(s) for s in HARDEN_SHIFTS]
    t0 = time.time()
    for i, step in enumerate(range(CHUNK, steps + 1, CHUNK)):
        state, aux = chunks[i % len(chunks)](state, jax.random.key(step))
        print(json.dumps({"step": step, "loss": float(aux["loss"]),
                          "trigger_loss": float(aux["trigger_loss"]),
                          "shift_idx": i % len(chunks),
                          "wall_s": round(time.time() - t0, 1)}),
              flush=True)
    checkpoints.save(outdir, {"params": state.params}, steps)
    return cfg, tr, state


def eval_all_families(cfg, tr, params, n: int):
    import jax
    import jax.numpy as jnp

    from paddlerobotics_tpu.hri import synthetic_scene as ss
    from paddlerobotics_tpu.hri.eval_client import OfflineEvaluator

    @jax.jit
    def score_fn(params, evb):
        out = tr.model.apply(params, tr._tokens(evb), evb["frame_ids"],
                             evb["padding_mask"])
        return jax.nn.sigmoid(out["trigger_logits"][:, -1])

    evaluator = OfflineEvaluator(None)
    fam_scores = {}
    for fam, shift in FAMILIES.items():
        rng = np.random.RandomState(55_000)
        ev = ss.generate_windows(rng, n, cfg, shift=shift or None)
        labels = np.asarray(ev["has_act"][:, -1])
        evj = {k: jnp.asarray(v) for k, v in ev.items()}
        fam_scores[fam] = (np.asarray(score_fn(params, evj)), labels)

    # operating threshold chosen on the NOMINAL family (the hardened
    # model's own deployment sweep), then applied everywhere
    sc0, lb0 = fam_scores["in_dist"]
    sweep0 = evaluator.sweep_thresholds(
        sc0, lb0, thresholds=np.arange(0.3, 0.96, 0.05))
    ok = [r for r in sweep0 if r["precision"] >= 0.95]
    op = (max(ok, key=lambda r: r["recall"]) if ok
          else max(sweep0, key=lambda r: r["f1"]))
    op_thr = op["threshold"]

    rows = []
    for fam, (scores, labels) in fam_scores.items():
        at_op = evaluator.sweep_thresholds(
            scores, labels, thresholds=np.asarray([op_thr]))[0]
        sweep = evaluator.sweep_thresholds(
            scores, labels, thresholds=np.arange(0.3, 0.96, 0.05))
        ok = [r for r in sweep if r["precision"] >= 0.95]
        fam_thr = (max(ok, key=lambda r: r["recall"]) if ok
                   else max(sweep, key=lambda r: r["f1"]))
        row = {"family": fam, "n": n,
               "pos_frac": round(float(labels.mean()), 3),
               "auc": round(auc_score(scores, labels), 4),
               "P_at_op": round(at_op["precision"], 3),
               "R_at_op": round(at_op["recall"], 3),
               "fam_best_thr": fam_thr["threshold"],
               "fam_best_P": round(fam_thr["precision"], 3),
               "fam_best_R": round(fam_thr["recall"], 3)}
        rows.append(row)
        print(json.dumps({"variant": "visual_token_hardened", **row}),
              flush=True)
    return {"variant": "visual_token_hardened",
            "operating_threshold": op_thr, "families": rows}


def main():
    steps, batch, n = 4000, 64, 512
    for a in sys.argv[1:]:
        if a.startswith("steps="):
            steps = int(a.split("=", 1)[1])
        elif a.startswith("batch="):
            batch = int(a.split("=", 1)[1])
        elif a.startswith("n="):
            n = int(a.split("=", 1)[1])
    cfg, tr, state = train_hardened(steps, batch, "/tmp/hri_harden")
    entry = eval_all_families(cfg, tr, state.params, n)
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "hri_shift_summary.json")
    out = []
    if os.path.exists(dst):
        out = [e for e in json.load(open(dst))
               if e["variant"] != entry["variant"]]
    out.append(entry)
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(f"appended hardened rows to {dst}")


if __name__ == "__main__":
    main()
