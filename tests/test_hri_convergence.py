"""Synthetic-scene learnability: the attention controller must CONVERGE
on the procedural greeting stream (hri/synthetic_scene.py), not merely
step — the round-3 verdict's gap between "compiles" and "works".

The full-size convergence study lives in scripts_dev/hri_convergence.py
(docs/hri_training.md); this pins a fast, deterministic floor: a tiny
controller reaches trigger AUC > 0.85 within 200 steps.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _auc(scores, labels):
    o = np.argsort(scores)
    r = np.empty(len(scores), float)
    r[o] = np.arange(len(scores))
    npos, nneg = labels.sum(), (1 - labels).sum()
    return float((r[labels > 0.5].sum() - npos * (npos - 1) / 2)
                 / (npos * nneg))


def _tiny_cfg(variant="visual_token"):
    from paddlerobotics_tpu.hri.attention_ctrl import AttnCtrlConfig

    return AttnCtrlConfig(inputs_type=variant, num_actions=8,
                          num_frames=6, tokens_per_frame=8, model_dim=64,
                          num_decoder_blocks=2, num_heads=4, ffn_dim=128)


def test_scene_labels_follow_the_rule():
    """has_act/is_obj/act_ids must be consistent with the generator's
    near+approach+facing trigger rule and with each other."""
    from paddlerobotics_tpu.hri import synthetic_scene as ss

    cfg = _tiny_cfg()
    b = ss.generate_windows(np.random.RandomState(0), 64, cfg)
    F, K = cfg.num_frames, cfg.tokens_per_frame
    has = b["has_act"]
    obj = b["is_obj"].reshape(64, F, K)
    acts = b["act_ids"]
    # triggered frames carry a non-null action and exactly the
    # triggering actor slots marked
    assert ((acts > 0) == (has > 0.5)).all()
    assert (obj.sum(-1) >= 1)[has > 0.5].all()
    assert (obj.sum(-1) == 0)[has <= 0.5].all()
    # act ids stay in the synthetic action space
    assert acts.max() < ss.NUM_ACTIONS_MIN + 1
    # non-degenerate positive rate
    assert 0.01 < has.mean() < 0.5
    # padding: marked slots carry tokens, unmarked are zero
    tok = b["visual_tokens"]
    pad = b["padding_mask"]
    assert (np.abs(tok[pad < 0.5]).max() if (pad < 0.5).any() else 0) == 0


def test_device_generator_labels_follow_rule():
    """The on-device (JAX) generator obeys the same trigger/obj/act
    invariants as the numpy generator it mirrors."""
    from paddlerobotics_tpu.hri import synthetic_scene as ss

    cfg = _tiny_cfg()
    b = {k: np.asarray(v) for k, v in
         ss.generate_windows_device(jax.random.key(0), 64, cfg).items()}
    F, K = cfg.num_frames, cfg.tokens_per_frame
    has, acts = b["has_act"], b["act_ids"]
    obj = b["is_obj"].reshape(64, F, K)
    assert ((acts > 0) == (has > 0.5)).all()
    assert (obj.sum(-1) >= 1)[has > 0.5].all()
    assert (obj.sum(-1) == 0)[has <= 0.5].all()
    assert acts.max() < ss.NUM_ACTIONS_MIN + 1
    assert 0.01 < has.mean() < 0.5
    tok, pad = b["visual_tokens"], b["padding_mask"]
    assert (np.abs(tok[pad < 0.5]).max() if (pad < 0.5).any() else 0) == 0


def test_device_generator_crop_variant():
    """inst_crop emits the (1280-d feat, cls scores, pos-emb) triple
    with padding consistent across all three."""
    from paddlerobotics_tpu.hri import synthetic_scene as ss

    cfg = _tiny_cfg("inst_crop")
    b = {k: np.asarray(v) for k, v in
         ss.generate_windows_device(jax.random.key(1), 32, cfg).items()}
    T = cfg.num_frames * cfg.tokens_per_frame
    assert b["inst_crop_feat"].shape == (32, T, 1280)
    assert b["inst_cls"].shape == (32, T, cfg.inst_cls_dim)
    assert b["inst_pos_emb"].shape == (32, T, 50)
    pad = b["padding_mask"] > 0.5
    assert (np.abs(b["inst_crop_feat"][~pad]).max() == 0)
    assert (np.abs(b["inst_cls"][~pad]).max() == 0)
    # real person tokens carry a class-0 score near 1; clutter one-hot
    assert b["inst_cls"][pad].sum(-1).min() > 0.5
    n = {k: np.asarray(v) for k, v in ss.generate_windows(
        np.random.RandomState(1), 32, cfg).items()}
    assert abs(n["padding_mask"].mean() - b["padding_mask"].mean()) < 0.05


def test_device_generator_matches_numpy_distribution():
    """Summary statistics of the two generators agree — the convergence
    study trains on device batches and evaluates on numpy windows, so a
    distribution drift between them would silently cap eval AUC."""
    from paddlerobotics_tpu.hri import synthetic_scene as ss

    cfg = _tiny_cfg()
    n = 512
    a = ss.generate_windows(np.random.RandomState(3), n, cfg)
    d = {k: np.asarray(v) for k, v in
         ss.generate_windows_device(jax.random.key(3), n, cfg).items()}
    for key, tol in (("has_act", 0.03), ("padding_mask", 0.03),
                     ("is_obj", 0.02)):
        assert abs(a[key].mean() - d[key].mean()) < tol, (
            f"{key}: numpy {a[key].mean():.4f} vs device "
            f"{d[key].mean():.4f}")
    # token content: mean norm of real (non-pad) tokens
    def tok_norm(b):
        t = b["visual_tokens"].reshape(-1, t_dim)
        m = b["padding_mask"].ravel() > 0.5
        return float(np.linalg.norm(t[m], axis=-1).mean())
    t_dim = a["visual_tokens"].shape[-1]
    assert abs(tok_norm(a) - tok_norm(d)) < 0.5
    # action-id histogram over triggering frames
    ha = np.bincount(a["act_ids"][a["has_act"] > 0.5].astype(int),
                     minlength=8)[1:7]
    hd = np.bincount(d["act_ids"][d["has_act"] > 0.5].astype(int),
                     minlength=8)[1:7]
    assert np.abs(ha / ha.sum() - hd / hd.sum()).max() < 0.1


@pytest.mark.parametrize("variant", ["instance", "without_inst_fm",
                                     "without_inst_cls",
                                     "without_inst_pos"])
def test_instance_family_generators(variant):
    """The instance-family ablations (parallel_train_attn.py:25-31) emit
    exactly the keys the variant consumes, zero tokens off-padding, and
    the same label rule — numpy and device generators alike."""
    from paddlerobotics_tpu.hri import synthetic_scene as ss

    cfg = _tiny_cfg(variant)
    T = cfg.num_frames * cfg.tokens_per_frame
    keys = ss.variant_token_keys(variant)
    for b in (ss.generate_windows(np.random.RandomState(5), 24, cfg),
              {k: np.asarray(v) for k, v in ss.generate_windows_device(
                  jax.random.key(5), 24, cfg).items()}):
        tok_keys = tuple(k for k in ss.variant_token_keys("instance")
                         if k in b)
        assert tok_keys == keys
        pad = b["padding_mask"] > 0.5
        has, acts = b["has_act"], b["act_ids"]
        assert ((acts > 0) == (has > 0.5)).all()
        if "inst_fm" in b:
            assert b["inst_fm"].shape == (24, T, 512, 5, 5)
            assert np.abs(b["inst_fm"][~pad]).max() == 0
        if "inst_cls" in b:
            assert np.abs(b["inst_cls"][~pad]).max() == 0
        if "inst_pos_emb" in b:
            assert np.abs(b["inst_pos_emb"][~pad]).max() == 0


def test_instance_fm_spatial_structure():
    """inst_fm must be appearance ⊗ FM_SPATIAL (+ small cell noise) in
    BOTH generators — the 1×1-conv reduction path learns from this
    structure, so a drift between generators would cap the fm variants'
    eval AUC."""
    from paddlerobotics_tpu.hri import synthetic_scene as ss

    cfg = _tiny_cfg("without_inst_cls")   # fm + pos, no cls buffer
    for b in (ss.generate_windows(np.random.RandomState(6), 16, cfg),
              {k: np.asarray(v) for k, v in ss.generate_windows_device(
                  jax.random.key(6), 16, cfg).items()}):
        pad = b["padding_mask"] > 0.5
        fm = b["inst_fm"][pad]                      # (M, 512, 5, 5)
        assert len(fm) > 0
        # per-cell mean |fm| follows the fixed spatial profile
        prof = np.abs(fm).mean(axis=(0, 1))          # (5, 5)
        ref = ss.FM_SPATIAL
        ratio = prof / prof[2, 2]
        assert np.abs(ratio - ref / ref[2, 2]).max() < 0.1, ratio
        # center cell ≈ the appearance vector itself (profile peak 1.0)
        center = fm[:, :, 2, 2]
        assert float(np.linalg.norm(center, axis=-1).mean()) > 1.0


def test_without_inst_fm_converges():
    """The cheapest instance-family ablation trains through the shared
    trainer path; its AUC ceiling is < 1 by construction (the facing
    attribute lives only in the dropped appearance), but near+approach
    is recoverable from pos-emb — the floor is well above chance."""
    from paddlerobotics_tpu.hri import synthetic_scene as ss
    from paddlerobotics_tpu.hri.train_attention import AttentionTrainer

    cfg = _tiny_cfg("without_inst_fm")
    tr = AttentionTrainer(cfg, lr=3e-4, weight_decay=0.01)
    state = tr.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    ev = ss.generate_windows(rng, 256, cfg)
    evj = {k: jnp.asarray(v) for k, v in ev.items()}
    lab = np.asarray(ev["has_act"]).ravel()

    for _ in range(200):
        b = ss.generate_windows(rng, 64, cfg)
        state, aux = tr.train_step(
            state, {k: jnp.asarray(v) for k, v in b.items()})
    out = tr.model.apply(state.params, tr._tokens(evj), evj["frame_ids"],
                         evj["padding_mask"])
    score = np.asarray(jax.nn.sigmoid(out["trigger_logits"])).ravel()
    auc = _auc(score, lab)
    assert auc > 0.8, f"without_inst_fm AUC {auc:.3f} — not learning"


def test_trigger_auc_converges():
    from paddlerobotics_tpu.hri import synthetic_scene as ss
    from paddlerobotics_tpu.hri.train_attention import AttentionTrainer

    cfg = _tiny_cfg()
    tr = AttentionTrainer(cfg, lr=3e-4, weight_decay=0.01)
    state = tr.init(jax.random.key(0))
    rng = np.random.RandomState(0)
    ev = ss.generate_windows(rng, 256, cfg)
    evj = {k: jnp.asarray(v) for k, v in ev.items()}
    lab = np.asarray(ev["has_act"]).ravel()

    for _ in range(200):
        b = ss.generate_windows(rng, 64, cfg)
        state, aux = tr.train_step(
            state, {k: jnp.asarray(v) for k, v in b.items()})
    out = tr.model.apply(state.params, tr._tokens(evj), evj["frame_ids"],
                         evj["padding_mask"])
    score = np.asarray(jax.nn.sigmoid(out["trigger_logits"])).ravel()
    auc = _auc(score, lab)
    assert auc > 0.85, f"trigger AUC {auc:.3f} — controller not learning"
