"""Attention controller: transformer decoder over visual tokens with
trigger / object / action heads (rebuild of interaction/attention_ctrl.py).

Structure (attention_ctrl.py:279-432):
- inputs: 10 frames × 20 tokens of 562-d visual tokens (512-d GAP'd
  RoIAlign feats + 50-d sin bbox pos-emb), or ablation variants
  (inst_fm + cls + pos, inst_crop via MobileNetV2);
- frame-id embedding table (num_frames+1, D) with padding idx 0, added
  at EVERY decoder block input;
- block-causal attention from frame ids; padding mask over absent
  detections;
- heads: trigger (per-frame sigmoid, frame-pooled hid), obj_cls
  (per-token sigmoid), action (frame hid · projected action embeddings);
- losses: 5·trigger sigmoid-CE + padding-masked obj CE + act NLL/frames;
- test-time: temperature softmax + top-k sampling excluding the null
  action (attention_ctrl.py:252-277);
- inference mode: single frame in, past-KV cache carried outside.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerobotics_tpu.hri.transformer import (TransformerDecoder,
                                                frame_ids_to_attn_mask)


@dataclasses.dataclass(frozen=True)
class AttnCtrlConfig:
    inputs_type: str = "visual_token"
    num_actions: int = 1000
    act_tr_dim: int = 778          # concat(one-hot act, one-hot exp, ERNIE 768)
    num_frames: int = 10
    tokens_per_frame: int = 20
    inst_fm_reduce_dim: int = 128
    inst_fm_flatten_dim: int = 512
    inst_cls_dim: int = 80
    inst_pos_dim: int = 50
    visual_token_dim: int = 562
    model_dim: int = 512
    num_decoder_blocks: int = 6
    num_heads: int = 8
    ffn_dim: int = 2048
    dropout: float = 0.0
    normalize_before: bool = False
    trigger_loss_coef: float = 5.0
    obj_loss_coef: float = 1.0
    act_loss_coef: float = 1.0
    use_last_act_loss: bool = False
    use_pallas_attention: bool = False


class TriggerHead(nn.Module):
    """MLP → 1 logit (interaction/trigger.py:4-53)."""

    hidden_dims: tuple = (256,)

    @nn.compact
    def __call__(self, feat):
        h = feat
        for d in self.hidden_dims:
            h = nn.relu(nn.Dense(d)(h))
        return nn.Dense(1)(h)[..., 0]   # logits


def sigmoid_ce(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


class AttentionController(nn.Module):
    cfg: AttnCtrlConfig

    @nn.compact
    def __call__(self, tokens: dict, frame_ids: jnp.ndarray,
                 padding_mask: jnp.ndarray,
                 past_kv_arr: Optional[jnp.ndarray] = None,
                 past_padding_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        """tokens: dict of input tensors per inputs_type:
          visual_token → {'visual_tokens': (B,T,562)}
          instance     → {'inst_fm': (B,T,512,5,5), 'inst_cls': (B,T,80),
                          'inst_pos_emb': (B,T,50)} (any subset for the
                          without_* ablations)
        Returns dict with hid/frame_hid/trigger_logits/obj_logits/
        act_logits/present_kv_arr/attn_weights.
        """
        cfg = self.cfg
        # --- assemble + project tokens (attention_ctrl.py:296-365)
        if "visual_tokens" in tokens:
            x = nn.Dense(cfg.model_dim, use_bias=False,
                         name="vt_fc")(tokens["visual_tokens"])
        else:
            feats = []
            if "inst_fm" in tokens:
                fm = tokens["inst_fm"]               # (B,T,C,5,5)
                B, T = fm.shape[:2]
                fm = fm.reshape(B * T, *fm.shape[2:]).transpose(0, 2, 3, 1)
                fm = nn.relu(nn.Conv(cfg.inst_fm_reduce_dim, (1, 1),
                                     name="inst_fm_conv")(fm))
                fm = fm.reshape(B, T, -1)
                fm = nn.relu(nn.Dense(cfg.inst_fm_flatten_dim,
                                      name="inst_fm_fc")(fm))
                feats.append(fm)
            if "inst_crop_feat" in tokens:
                # pre-extracted MobileNetV2 features of instance crops
                cf = nn.relu(nn.Dense(512, name="inst_crop_fc")(
                    tokens["inst_crop_feat"]))
                feats.append(cf)
            if "inst_cls" in tokens:
                feats.append(tokens["inst_cls"])
            if "inst_pos_emb" in tokens:
                feats.append(tokens["inst_pos_emb"])
            x = nn.relu(nn.Dense(cfg.model_dim, name="inst_vt_fc")(
                jnp.concatenate(feats, axis=-1)))

        # --- frame embedding (padding idx 0 → zero row)
        wfe = self.param("wfe", nn.initializers.uniform(1.0),
                         (cfg.num_frames + 1, cfg.model_dim))
        frame_emb = jnp.where(
            (frame_ids > 0)[..., None], wfe[frame_ids], 0.0)

        attn_mask = frame_ids_to_attn_mask(frame_ids)
        decoder = TransformerDecoder(
            cfg.num_decoder_blocks, cfg.model_dim, cfg.num_heads,
            cfg.ffn_dim, tokens_per_frame=cfg.tokens_per_frame,
            dropout=cfg.dropout, normalize_before=cfg.normalize_before,
            use_pallas=cfg.use_pallas_attention, name="decoder")
        hid, frame_hid, present_kv, attn_w = decoder(
            x, frame_emb, attn_mask, padding_mask,
            past_kv_arr=past_kv_arr, past_padding_mask=past_padding_mask,
            deterministic=deterministic)

        trigger_logits = TriggerHead(name="trigger")(frame_hid)  # (B,F)
        obj_logits = TriggerHead(name="obj_cls")(hid)            # (B,T)

        # action head: frame_hid · proj(action embeddings)
        wae = self.param("wae", nn.initializers.uniform(1.0),
                         (cfg.num_actions + 1, cfg.act_tr_dim))
        wae_proj = nn.Dense(cfg.model_dim, name="wae_proj")(
            wae[: cfg.num_actions])
        act_logits = jnp.einsum("bfd,ad->bfa", frame_hid, wae_proj)

        return {
            "hid": hid, "frame_hid": frame_hid,
            "trigger_logits": trigger_logits, "obj_logits": obj_logits,
            "act_logits": act_logits, "present_kv_arr": present_kv,
            "attn_weights": attn_w,
        }


def controller_loss(cfg: AttnCtrlConfig, outputs: dict,
                    has_act: jnp.ndarray, is_obj: jnp.ndarray,
                    act_ids: jnp.ndarray, padding_mask: jnp.ndarray):
    """Training loss (attention_ctrl.py:408-432)."""
    trigger_loss = jnp.mean(sigmoid_ce(outputs["trigger_logits"], has_act))
    obj_loss = jnp.mean(sigmoid_ce(outputs["obj_logits"], is_obj) *
                        padding_mask)
    log_probs = jax.nn.log_softmax(outputs["act_logits"], axis=-1)
    nll = -jnp.take_along_axis(log_probs, act_ids[..., None], axis=-1)[..., 0]
    if cfg.use_last_act_loss:
        act_loss = jnp.mean(nll[:, -1])
    else:
        act_loss = jnp.mean(jnp.sum(nll, axis=1) / cfg.num_frames)
    total = (cfg.trigger_loss_coef * trigger_loss +
             cfg.obj_loss_coef * obj_loss + cfg.act_loss_coef * act_loss)
    return total, {"trigger_loss": trigger_loss, "obj_loss": obj_loss,
                   "act_loss": act_loss, "loss": total}


def top_k_sampling(rng: jax.Array, act_logits: jnp.ndarray,
                   temperature: float, top_k: int,
                   null_act_idx: int = 0) -> jnp.ndarray:
    """Temperature + top-k sampling excluding the null action
    (attention_ctrl.py:252-277). act_logits (B,F,A) → ids (B,F)."""
    logits = act_logits / temperature
    mask = jnp.ones(logits.shape[-1]).at[null_act_idx].set(0.0)
    logits = logits * mask + (-1e10) * (1.0 - mask)
    probs = jax.nn.softmax(logits, axis=-1)
    kth = jnp.sort(probs, axis=-1)[..., -top_k][..., None]
    probs = jnp.where(probs >= kth, probs, 0.0)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    return jax.random.categorical(rng, jnp.log(probs + 1e-12), axis=-1)
