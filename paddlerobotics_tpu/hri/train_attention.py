"""Attention-controller training (rebuild of
scripts/train_attention_controller.py + parallel_train_attn.py).

The reference trains with fluid exe.run over mp-fed feeds, optionally
data-parallel via Paddle Fleet NCCL (train_attention_controller.py:
393-444). Here the train step is one jitted function; data parallelism
is a batch-axis NamedSharding over the device mesh (XLA emits the
gradient all-reduce — the compiled equivalent of fleet's allreduce), and
the reference's ablation fleet (one variant per GPU,
parallel_train_attn.py:25-31) becomes a vmap over hyperparameter
variants or per-device sharding of independent trainers.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from paddlerobotics_tpu.hri.attention_ctrl import (AttentionController,
                                                   AttnCtrlConfig,
                                                   controller_loss)


class AttnTrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def synthetic_batch(cfg: "AttnCtrlConfig", rng, batch_size: int) -> dict:
    """Random batch shaped for cfg.inputs_type (smoke/bench runs). The
    single source for variant-shaped batches — the ablation CLIs and
    tests all draw from here so the token keys can't drift from
    `AttentionTrainer.dummy_tokens`/`_tokens`."""
    B = batch_size
    T = cfg.num_frames * cfg.tokens_per_frame
    batch = {
        "frame_ids": jnp.tile(jnp.repeat(
            jnp.arange(1, cfg.num_frames + 1), cfg.tokens_per_frame),
            (B, 1)),
        "padding_mask": jnp.ones((B, T)),
        "has_act": jnp.asarray(rng.rand(B, cfg.num_frames) > 0.5,
                               jnp.float32),
        "act_ids": jnp.asarray(
            rng.randint(0, cfg.num_actions, (B, cfg.num_frames))),
        "is_obj": jnp.asarray(rng.rand(B, T) > 0.8, jnp.float32),
    }
    if cfg.inputs_type == "visual_token":
        batch["visual_tokens"] = jnp.asarray(
            rng.randn(B, T, cfg.visual_token_dim), jnp.float32)
    elif cfg.inputs_type == "inst_crop":
        batch["inst_crop_feat"] = jnp.asarray(
            rng.randn(B, T, 1280), jnp.float32)
        batch["inst_cls"] = jnp.asarray(
            rng.randn(B, T, cfg.inst_cls_dim), jnp.float32)
        batch["inst_pos_emb"] = jnp.asarray(
            rng.randn(B, T, cfg.inst_pos_dim), jnp.float32)
    else:
        if cfg.inputs_type != "without_inst_fm":
            batch["inst_fm"] = jnp.asarray(
                rng.randn(B, T, 512, 5, 5), jnp.float32)
        if cfg.inputs_type != "without_inst_cls":
            batch["inst_cls"] = jnp.asarray(
                rng.randn(B, T, cfg.inst_cls_dim), jnp.float32)
        if cfg.inputs_type != "without_inst_pos":
            batch["inst_pos_emb"] = jnp.asarray(
                rng.randn(B, T, cfg.inst_pos_dim), jnp.float32)
    return batch


class AttentionTrainer:
    def __init__(self, cfg: AttnCtrlConfig, lr: float = 1e-4,
                 weight_decay: float = 0.1, mesh=None):
        """weight_decay mirrors the reference's L2 regularizer 0.1
        (train_attention_controller.py Adam + L2(0.1))."""
        self.cfg = cfg
        self.model = AttentionController(cfg)
        self.tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adam(lr))
        self.mesh = mesh

    TOKEN_KEYS = ("visual_tokens", "inst_fm", "inst_cls", "inst_pos_emb",
                  "inst_crop_feat")

    def _variant_keys(self) -> tuple:
        """Token keys this cfg.inputs_type consumes (attention_ctrl.py:
        86-119)."""
        t = self.cfg.inputs_type
        if t == "visual_token":
            return ("visual_tokens",)
        if t == "inst_crop":
            return ("inst_crop_feat", "inst_cls", "inst_pos_emb")
        keys = []
        if t != "without_inst_fm":
            keys.append("inst_fm")
        if t != "without_inst_cls":
            keys.append("inst_cls")
        if t != "without_inst_pos":
            keys.append("inst_pos_emb")
        return tuple(keys)

    def _tokens(self, batch) -> dict:
        """Extract this variant's token tensors from a batch — selected
        by inputs_type, NOT by presence, so a shared batch carrying
        every key (one reader feeding the whole ablation fleet) feeds
        each variant only what its params expect. A missing required key
        raises (silently dropping one would route the model through the
        wrong token pathway)."""
        missing = [k for k in self._variant_keys() if k not in batch]
        if missing:
            raise KeyError(
                f"batch lacks token keys {missing} required by "
                f"inputs_type={self.cfg.inputs_type!r}")
        return {k: batch[k] for k in self._variant_keys()}

    def dummy_tokens(self, batch_size: int = 1) -> dict:
        """Zero tokens matching cfg.inputs_type (for init/templates)."""
        cfg = self.cfg
        T = cfg.num_frames * cfg.tokens_per_frame
        if cfg.inputs_type == "visual_token":
            return {"visual_tokens":
                    jnp.zeros((batch_size, T, cfg.visual_token_dim))}
        if cfg.inputs_type == "inst_crop":
            # pre-extracted MobileNetV2 pooled features (1280-d) of the
            # instance crops (reference feeds raw (3,128,128) crops
            # through MobileNetV2 inline, attention_ctrl.py:17,98-99)
            return {"inst_crop_feat": jnp.zeros((batch_size, T, 1280)),
                    "inst_cls": jnp.zeros((batch_size, T,
                                           cfg.inst_cls_dim)),
                    "inst_pos_emb": jnp.zeros((batch_size, T,
                                               cfg.inst_pos_dim))}
        toks = {}
        if cfg.inputs_type != "without_inst_fm":
            # raw RoIAligned fm channels (512 for the YOLO tap,
            # infer_v3.cpp:578-681)
            toks["inst_fm"] = jnp.zeros((batch_size, T, 512, 5, 5))
        if cfg.inputs_type != "without_inst_cls":
            toks["inst_cls"] = jnp.zeros((batch_size, T, cfg.inst_cls_dim))
        if cfg.inputs_type != "without_inst_pos":
            toks["inst_pos_emb"] = jnp.zeros(
                (batch_size, T, cfg.inst_pos_dim))
        return toks

    def init(self, rng) -> AttnTrainState:
        T = self.cfg.num_frames * self.cfg.tokens_per_frame
        tokens = self.dummy_tokens()
        fids = jnp.ones((1, T), jnp.int32)
        pad = jnp.ones((1, T))
        params = self.model.init(rng, tokens, fids, pad)
        return AttnTrainState(params, self.tx.init(params),
                              jnp.zeros((), jnp.int32))

    @functools.partial(jax.jit, static_argnums=(0,))
    def train_step(self, state: AttnTrainState, batch):
        """batch dict (B-leading): visual_tokens, frame_ids, padding_mask,
        has_act, act_ids, is_obj."""
        def loss_fn(params):
            out = self.model.apply(
                params, self._tokens(batch),
                batch["frame_ids"], batch["padding_mask"],
                deterministic=True)
            return controller_loss(self.cfg, out, batch["has_act"],
                                   batch["is_obj"], batch["act_ids"],
                                   batch["padding_mask"])

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return AttnTrainState(params, opt_state, state.step + 1), aux

    @functools.partial(jax.jit, static_argnums=(0,))
    def eval_step(self, state: AttnTrainState, batch):
        out = self.model.apply(
            state.params, self._tokens(batch),
            batch["frame_ids"], batch["padding_mask"])
        trigger_pred = jax.nn.sigmoid(out["trigger_logits"])
        # accuracy on the final-frame trigger decision
        correct = ((trigger_pred[:, -1] > 0.5) ==
                   (batch["has_act"][:, -1] > 0.5))
        act_pred = jnp.argmax(out["act_logits"][:, -1], axis=-1)
        act_correct = act_pred == batch["act_ids"][:, -1]
        has = batch["has_act"][:, -1] > 0.5
        act_acc = jnp.sum(act_correct * has) / jnp.maximum(jnp.sum(has), 1)
        return {"trigger_acc": jnp.mean(correct), "act_acc": act_acc}

    def shard_batch(self, batch):
        """Data-parallel placement over mesh axis 'env' (fleet equiv.)."""
        if self.mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        def place(x):
            spec = ["env"] + [None] * (x.ndim - 1)
            return jax.device_put(x, NamedSharding(self.mesh, P(*spec)))

        return jax.tree.map(place, batch)
