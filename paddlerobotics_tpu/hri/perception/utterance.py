"""Utterance encoder: BERT/ERNIE-style text transformer + WordPiece
tokenizer + bag-of-words baseline.

Rebuild of HRI/TFVT_HRI/perception/utterance/ (ernie_v1.py:46-327 fluid
encoder, tokenizer.py WordPiece, bow.py baseline, eval.py wrapper):
produces 768-d utterance embeddings used to build multimodal action
embeddings (collect_act_emb.py:42-54).
"""

from __future__ import annotations

import dataclasses
from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ErnieConfig:
    vocab_size: int = 18000
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_size: int = 3072
    max_len: int = 512
    type_vocab_size: int = 2


class ErnieEncoder(nn.Module):
    """BERT-style encoder; returns (sequence_output, pooled CLS)."""

    cfg: ErnieConfig

    @nn.compact
    def __call__(self, token_ids, sent_ids=None, mask=None,
                 deterministic=True):
        cfg = self.cfg
        B, T = token_ids.shape
        if mask is None:
            mask = (token_ids > 0).astype(jnp.float32)
        if sent_ids is None:
            sent_ids = jnp.zeros_like(token_ids)
        pos_ids = jnp.arange(T)[None, :]

        h = (nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_emb")(
                token_ids) +
             nn.Embed(cfg.max_len, cfg.hidden_size, name="pos_emb")(pos_ids) +
             nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                      name="sent_emb")(sent_ids))
        h = nn.LayerNorm(epsilon=1e-12)(h)

        attn_bias = (1.0 - mask[:, None, None, :]) * -1e9
        for i in range(cfg.num_layers):
            a = nn.MultiHeadDotProductAttention(
                num_heads=cfg.num_heads, qkv_features=cfg.hidden_size,
                name=f"attn_{i}")(h, h, mask=mask[:, None, None, :] > 0)
            h = nn.LayerNorm(epsilon=1e-12)(h + a)
            f = nn.Dense(cfg.ffn_size)(h)
            f = nn.Dense(cfg.hidden_size)(nn.gelu(f))
            h = nn.LayerNorm(epsilon=1e-12)(h + f)
        pooled = jnp.tanh(nn.Dense(cfg.hidden_size, name="pooler")(h[:, 0]))
        return h, pooled


class WordPieceTokenizer:
    """Greedy longest-match-first WordPiece (tokenizer.py:287 semantics)."""

    def __init__(self, vocab: dict[str, int], unk_token: str = "[UNK]",
                 max_chars_per_word: int = 100):
        self.vocab = vocab
        self.unk = unk_token
        self.max_chars = max_chars_per_word

    def tokenize_word(self, word: str) -> List[str]:
        if len(word) > self.max_chars:
            return [self.unk]
        out, start = [], 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [self.unk]
            out.append(cur)
            start = end
        return out

    def encode(self, text: str, max_len: int = 64) -> np.ndarray:
        # CJK-aware split: each CJK char is its own word
        words: List[str] = []
        buf = ""
        for ch in text.lower():
            if "一" <= ch <= "鿿":
                if buf:
                    words.append(buf)
                    buf = ""
                words.append(ch)
            elif ch.isspace():
                if buf:
                    words.append(buf)
                    buf = ""
            else:
                buf += ch
        if buf:
            words.append(buf)
        toks = ["[CLS]"]
        for w in words:
            toks.extend(self.tokenize_word(w))
        toks.append("[SEP]")
        ids = [self.vocab.get(t, self.vocab.get(self.unk, 0))
               for t in toks][:max_len]
        ids = ids + [0] * (max_len - len(ids))
        return np.asarray(ids, np.int32)


class BoWEncoder(nn.Module):
    """Bag-of-words baseline (bow.py:19): mean of word embeddings."""

    vocab_size: int
    dim: int = 768

    @nn.compact
    def __call__(self, token_ids):
        emb = nn.Embed(self.vocab_size, self.dim)(token_ids)
        mask = (token_ids > 0).astype(jnp.float32)[..., None]
        return jnp.sum(emb * mask, axis=-2) / jnp.maximum(
            jnp.sum(mask, axis=-2), 1.0)


class UtteranceEncoder:
    """Eval wrapper (utterance/eval.py:11): text → 768-d embedding."""

    def __init__(self, vocab: dict[str, int] | None = None,
                 cfg: ErnieConfig | None = None):
        self.cfg = cfg or ErnieConfig()
        vocab = vocab or {"[UNK]": 1, "[CLS]": 2, "[SEP]": 3}
        self.tokenizer = WordPieceTokenizer(vocab)
        self.model = ErnieEncoder(self.cfg)
        self.params = None

    def init(self, rng):
        ids = jnp.zeros((1, 16), jnp.int32)
        self.params = self.model.init(rng, ids)
        return self.params

    def encode(self, texts: List[str], max_len: int = 64) -> jnp.ndarray:
        ids = jnp.asarray(np.stack([
            self.tokenizer.encode(t, max_len) for t in texts]))
        _, pooled = self.model.apply(self.params, ids)
        return pooled
