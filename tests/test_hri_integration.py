"""HRI end-to-end integration: train a tiny controller on a synthetic
separable task, then serve it and check the decisions reflect training.

Synthetic rule: windows whose final-frame tokens carry a positive
pattern (+1 bias on the first 64 dims) are trigger moments with action
id 3 and target token 0; plain windows are negatives.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paddlerobotics_tpu.hri.attention_ctrl import AttnCtrlConfig
from paddlerobotics_tpu.hri.train_attention import AttentionTrainer

CFG = AttnCtrlConfig(num_actions=7, num_frames=4, tokens_per_frame=3,
                     model_dim=32, num_decoder_blocks=2, num_heads=4,
                     ffn_dim=64, act_tr_dim=16)


def make_batch(rng, B=16):
    T = CFG.num_frames * CFG.tokens_per_frame
    tokens = rng.randn(B, T, CFG.visual_token_dim).astype(np.float32) * 0.3
    pos = rng.rand(B) > 0.5
    has_act = np.zeros((B, CFG.num_frames), np.float32)
    act_ids = np.zeros((B, CFG.num_frames), np.int64)
    is_obj = np.zeros((B, T), np.float32)
    for i in range(B):
        if pos[i]:
            sl = slice((CFG.num_frames - 1) * CFG.tokens_per_frame, T)
            tokens[i, sl, :64] += 1.0
            has_act[i, -1] = 1.0
            act_ids[i, -1] = 3
            is_obj[i, (CFG.num_frames - 1) * CFG.tokens_per_frame] = 1.0
    fids = np.tile(np.repeat(np.arange(1, CFG.num_frames + 1),
                             CFG.tokens_per_frame), (B, 1))
    return {
        "visual_tokens": jnp.asarray(tokens),
        "frame_ids": jnp.asarray(fids),
        "padding_mask": jnp.ones((B, T)),
        "has_act": jnp.asarray(has_act),
        "act_ids": jnp.asarray(act_ids),
        "is_obj": jnp.asarray(is_obj),
    }, pos


def test_train_then_decide():
    rng = np.random.RandomState(0)
    trainer = AttentionTrainer(CFG, lr=3e-4, weight_decay=0.0)
    state = trainer.init(jax.random.key(0))

    for step in range(150):
        batch, _ = make_batch(rng)
        state, aux = trainer.train_step(state, batch)

    # evaluation on fresh data: trigger and action must be learned
    batch, pos = make_batch(rng, B=64)
    metrics = trainer.eval_step(state, batch)
    assert float(metrics["trigger_acc"]) > 0.9, metrics
    assert float(metrics["act_acc"]) > 0.9, metrics

    # decision check through the model's own outputs (serving semantics):
    # positive windows trigger with the learned action, negatives don't.
    out = trainer.model.apply(state.params,
                              {"visual_tokens": batch["visual_tokens"]},
                              batch["frame_ids"], batch["padding_mask"])
    trig = np.asarray(jax.nn.sigmoid(out["trigger_logits"][:, -1]))
    act = np.asarray(jnp.argmax(out["act_logits"][:, -1], axis=-1))
    pos_idx = np.where(pos)[0]
    neg_idx = np.where(~pos)[0]
    assert trig[pos_idx].mean() > 0.8
    assert trig[neg_idx].mean() < 0.3
    assert (act[pos_idx] == 3).mean() > 0.9
