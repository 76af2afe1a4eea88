"""Transformer decoder with past-KV incremental decoding (flax).

Rebuild of HRI/TFVT_HRI/interaction/transformer.py:
- MaskedMultiHeadAttention (transformer.py:5-115): fused QKV projection
  (no bias), score masking as `p·m − 1e10·(1−m)` followed by re-masking
  the softmax weights, past-KV concatenation along the source axis.
- TransformerDecoderBlock (:118-259): frame embeddings added to the
  block INPUT at every layer, post-norm (default) or pre-norm residual
  wiring, GELU MLP.
- TransformerDecoder (:262-310): returns per-token hidden states, per-
  frame max-pooled hidden states (padding-masked), stacked present-KV
  for incremental inference, and attention weights.

The attention mask is built from frame ids in pure JAX (`frame_ids_to
_attn_mask`): for non-decreasing ids the reference's py_func block mask
(attention_ctrl.py:216-250) is exactly `id[key] ≤ id[query]` — no host
callback needed, so the whole model jits (the reference had to ship a
separate mask-as-input path for Jetson because of py_func).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e10


def frame_ids_to_attn_mask(frame_ids: jnp.ndarray) -> jnp.ndarray:
    """(B,T) non-decreasing frame ids → (B,T,T) block mask.

    mask[b,i,j] = 1 where frame_ids[b,j] <= frame_ids[b,i]: queries see
    all tokens of their own and previous frames.
    """
    q = frame_ids[..., :, None]
    k = frame_ids[..., None, :]
    return (k <= q).astype(jnp.float32)


def merge_padding_mask(attn_mask: jnp.ndarray,
                       padding_mask: jnp.ndarray) -> jnp.ndarray:
    """attn_mask (B,T,S) ∧ outer(padding, padding) (transformer.py:131-137)."""
    pm = padding_mask[..., :, None] * padding_mask[..., None, :]
    T = attn_mask.shape[-2]
    return attn_mask * pm[..., -T:, :]


class MaskedMultiHeadAttention(nn.Module):
    model_dim: int
    num_heads: int
    dropout: float = 0.0
    use_pallas: bool = False   # flash-attention kernel (no weights output)

    @nn.compact
    def __call__(self, x, attn_mask, past_kv=None, deterministic=True):
        """x (B,T,D); attn_mask (B,T,S); past_kv (B,2,H,P,hd) or None.
        Returns (attn_out (B,T,D), present_kv (B,2,H,T,hd), weights)."""
        B, T, D = x.shape
        H = self.num_heads
        hd = D // H
        qkv = nn.Dense(3 * self.model_dim, use_bias=False, name="qkv_fc")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        present_kv = jnp.stack([k, v], axis=1)
        if past_kv is not None:
            pk, pv = past_kv[:, 0], past_kv[:, 1]
            k = jnp.concatenate([pk, k], axis=-2)
            v = jnp.concatenate([pv, v], axis=-2)

        if self.use_pallas and (self.dropout == 0 or deterministic):
            from paddlerobotics_tpu.ops.pallas.attention import \
                flash_attention

            attn = flash_attention(q, k, v, attn_mask)
            # flash never materializes the score matrix; weights output
            # is a placeholder for API parity
            weights = jnp.zeros((B, H, T, k.shape[-2]), q.dtype)
        else:
            scores = jnp.einsum("bhtd,bhsd->bhts", q, k) * (hd ** -0.5)
            m = attn_mask[:, None, :, :]
            scores = scores * m + NEG_INF * (1.0 - m)
            weights = jax.nn.softmax(scores, axis=-1) * m
            if self.dropout > 0 and not deterministic:
                weights = nn.Dropout(self.dropout)(
                    weights, deterministic=deterministic)
            attn = jnp.einsum("bhts,bhsd->bhtd", weights, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, T, D)
        out = nn.Dense(self.model_dim, use_bias=False, name="out_fc")(attn)
        return out, present_kv, weights


class TransformerDecoderBlock(nn.Module):
    model_dim: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.0
    normalize_before: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, frame_emb, attn_mask, padding_mask,
                 past_kv=None, past_padding_mask=None, deterministic=True):
        if past_padding_mask is not None:
            padding_mask = jnp.concatenate(
                [past_padding_mask, padding_mask], axis=-1)
            pad = jnp.ones(attn_mask.shape[:-1] +
                           (past_padding_mask.shape[-1],), attn_mask.dtype)
            attn_mask = jnp.concatenate([pad, attn_mask], axis=-1)
        attn_mask = merge_padding_mask(attn_mask, padding_mask)

        mha = MaskedMultiHeadAttention(self.model_dim, self.num_heads,
                                       self.dropout,
                                       use_pallas=self.use_pallas)
        ln1 = nn.LayerNorm(epsilon=1e-6)
        ln2 = nn.LayerNorm(epsilon=1e-6)

        def mlp(h):
            h1 = nn.gelu(nn.Dense(self.ffn_dim)(h))
            return nn.Dense(self.model_dim)(h1)

        if self.normalize_before:
            x_ = ln1(x)
            x_ = x_ if frame_emb is None else x_ + frame_emb
            attn, present_kv, w = mha(x_, attn_mask, past_kv, deterministic)
            x = x + attn
            x = x + mlp(ln2(x))
        else:
            x = x if frame_emb is None else x + frame_emb
            attn, present_kv, w = mha(x, attn_mask, past_kv, deterministic)
            x = ln1(x + attn)
            x = ln2(x + mlp(x))
        return x, present_kv, w


class TransformerDecoder(nn.Module):
    num_blocks: int
    model_dim: int
    num_heads: int
    ffn_dim: int
    tokens_per_frame: int = 10
    dropout: float = 0.0
    normalize_before: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, frame_emb, attn_mask, padding_mask,
                 past_kv_arr=None, past_padding_mask=None,
                 deterministic=True):
        """Returns (hid, frame_hid, present_kv_arr, attn_weights_arr)."""
        presents, weights = [], []
        for i in range(self.num_blocks):
            past_kv = None if past_kv_arr is None else past_kv_arr[:, i]
            x, pkv, w = TransformerDecoderBlock(
                self.model_dim, self.num_heads, self.ffn_dim,
                self.dropout, self.normalize_before,
                use_pallas=self.use_pallas, name=f"block_{i}")(
                    x, frame_emb, attn_mask, padding_mask,
                    past_kv, past_padding_mask, deterministic)
            presents.append(pkv)
            weights.append(w)
        present_kv_arr = jnp.stack(presents, axis=1)
        attn_weights_arr = jnp.stack(weights, axis=1)

        # per-frame max pooling with padding mask (transformer.py:276-289)
        B, T, D = x.shape
        nf = T // self.tokens_per_frame
        pm = padding_mask[..., -T:, None]
        h = pm * x + NEG_INF * (1.0 - pm)
        frame_hid = jnp.max(h.reshape(B, nf, self.tokens_per_frame, D),
                            axis=2)
        return x, frame_hid, present_kv_arr, attn_weights_arr
