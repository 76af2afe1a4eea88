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
    # ERNIE v1 ships hidden_act="relu" in its config json (consumed at
    # ernie_v1.py:57,121); gelu kept selectable for BERT-style configs.
    hidden_act: str = "relu"


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
            act = nn.gelu if cfg.hidden_act == "gelu" else nn.relu
            f = nn.Dense(cfg.ffn_size)(h)
            f = nn.Dense(cfg.hidden_size)(act(f))
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


# --- pretrained-weight import (ERNIE .pdparams / save_params dir) ------------

_PADDLE_FP32 = 5  # paddle framework.proto VarType.Type.FP32


def parse_paddle_var(data: bytes) -> np.ndarray:
    """Decode one fluid `save_params` variable file (LoDTensor binary:
    uint32 version | uint64 lod-level count + levels | uint32 tensor
    version | int32 desc size | TensorDesc proto {data_type=1 varint,
    dims=2 int64} | raw row-major data). Raises loudly on anything but
    FP32."""
    pos = 0

    def u32():
        nonlocal pos
        v = int.from_bytes(data[pos:pos + 4], "little")
        pos += 4
        return v

    def u64():
        nonlocal pos
        v = int.from_bytes(data[pos:pos + 8], "little")
        pos += 8
        return v

    if u32() != 0:
        raise ValueError("unsupported LoDTensor version")
    for _ in range(u64()):                  # skip LoD levels
        pos += u64()
    if u32() != 0:
        raise ValueError("unsupported tensor version")
    desc_size = u32()
    desc = data[pos:pos + desc_size]
    pos += desc_size

    dtype, dims = None, []
    dpos = 0
    while dpos < len(desc):
        tag = desc[dpos]
        dpos += 1
        field, wire = tag >> 3, tag & 7
        if wire == 0:                        # varint
            v = 0
            shift = 0
            while True:
                b = desc[dpos]
                dpos += 1
                v |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            if field == 1:
                dtype = v
            elif field == 2:
                dims.append(v)
        elif wire == 2:                      # packed dims
            n = desc[dpos]
            dpos += 1
            end = dpos + n
            while dpos < end:
                v = 0
                shift = 0
                while True:
                    b = desc[dpos]
                    dpos += 1
                    v |= (b & 0x7F) << shift
                    if not b & 0x80:
                        break
                    shift += 7
                if field == 2:
                    dims.append(v)
        else:
            raise ValueError(f"unexpected wire type {wire} in TensorDesc")
    if dtype != _PADDLE_FP32:
        raise ValueError(f"unsupported paddle dtype {dtype}")
    n = int(np.prod(dims)) if dims else 1
    arr = np.frombuffer(data, np.float32, count=n, offset=pos).copy()
    return arr.reshape(dims)


def load_paddle_params_dir(path: str) -> dict:
    """`fluid.io.save_params` directory (one binary file per variable,
    filename = variable name — the layout init_pretraining_params
    consumes) → ordered {name: ndarray}."""
    import os
    out = {}
    for name in sorted(os.listdir(path)):
        full = os.path.join(path, name)
        if os.path.isfile(full):
            with open(full, "rb") as f:
                out[name] = parse_paddle_var(f.read())
    return out


def _encode_paddle_var(arr: np.ndarray) -> bytes:
    """Inverse of `parse_paddle_var` (round-trip fixtures)."""
    arr = np.ascontiguousarray(arr, np.float32)
    desc = bytes([0x08, _PADDLE_FP32])                     # data_type
    for d in arr.shape:
        dim = bytearray([0x10])                            # field 2 varint
        v = int(d)
        while True:
            b = v & 0x7F
            v >>= 7
            dim.append(b | 0x80 if v else b)
            if not v:
                break
        desc += bytes(dim)
    return ((0).to_bytes(4, "little") + (0).to_bytes(8, "little") +
            (0).to_bytes(4, "little") +
            len(desc).to_bytes(4, "little") + desc + arr.tobytes())


def import_ernie_params(named, cfg: ErnieConfig):
    """Pretrained ERNIE v1 params → flax `ErnieEncoder` variables.

    `named`: {paddle_param_name: ndarray} from `load_paddle_params_dir`
    (or any loader). Names follow the reference graph exactly:
    word/pos/sent_embedding + pre_encoder layer norm (ernie_v1.py:77-98),
    encoder_layer_{i}_multi_head_att_{query,key,value,output}_fc.{w,b}_0,
    _post_att/_post_ffn layer norms ('dan' postprocess,
    ernie_v1.py:122-123), _ffn_fc_{0,1}, and pooled_fc
    (transformer.py:53-293, ernie_v1.py:138-141). Paddle fc weights are
    (in, out) like flax Dense; attention projections are reshaped to
    flax's (in, heads, head_dim) / (heads, head_dim, out) layout.
    """
    H, nh = cfg.hidden_size, cfg.num_heads
    hd = H // nh

    def w(name):
        if name not in named:
            raise KeyError(
                f"missing param {name!r}; have e.g. "
                f"{list(named)[:4]}")
        return jnp.asarray(np.asarray(named[name], np.float32))

    def ln(prefix):
        return {"scale": w(prefix + "_layer_norm_scale"),
                "bias": w(prefix + "_layer_norm_bias")}

    params = {
        "word_emb": {"embedding": w("word_embedding")},
        "pos_emb": {"embedding": w("pos_embedding")},
        "sent_emb": {"embedding": w("sent_embedding")},
        "LayerNorm_0": ln("pre_encoder"),
        "pooler": {"kernel": w("pooled_fc.w_0"),
                   "bias": w("pooled_fc.b_0")},
    }
    for i in range(cfg.num_layers):
        att = f"encoder_layer_{i}_multi_head_att"
        attn = {}
        for proj in ("query", "key", "value"):
            attn[proj] = {
                "kernel": w(f"{att}_{proj}_fc.w_0").reshape(H, nh, hd),
                "bias": w(f"{att}_{proj}_fc.b_0").reshape(nh, hd)}
        attn["out"] = {
            "kernel": w(f"{att}_output_fc.w_0").reshape(nh, hd, H),
            "bias": w(f"{att}_output_fc.b_0")}
        params[f"attn_{i}"] = attn
        params[f"LayerNorm_{2 * i + 1}"] = ln(
            f"encoder_layer_{i}_post_att")
        params[f"LayerNorm_{2 * i + 2}"] = ln(
            f"encoder_layer_{i}_post_ffn")
        params[f"Dense_{2 * i}"] = {
            "kernel": w(f"encoder_layer_{i}_ffn_fc_0.w_0"),
            "bias": w(f"encoder_layer_{i}_ffn_fc_0.b_0")}
        params[f"Dense_{2 * i + 1}"] = {
            "kernel": w(f"encoder_layer_{i}_ffn_fc_1.w_0"),
            "bias": w(f"encoder_layer_{i}_ffn_fc_1.b_0")}
    return {"params": params}


def export_ernie_params(variables, cfg: ErnieConfig) -> dict:
    """Inverse of `import_ernie_params` (flax → paddle-named arrays);
    used by the round-trip test and for pushing fine-tuned weights back
    toward a paddle deployment."""
    p = variables["params"]
    H, nh = cfg.hidden_size, cfg.num_heads
    out = {
        "word_embedding": np.asarray(p["word_emb"]["embedding"]),
        "pos_embedding": np.asarray(p["pos_emb"]["embedding"]),
        "sent_embedding": np.asarray(p["sent_emb"]["embedding"]),
        "pre_encoder_layer_norm_scale":
            np.asarray(p["LayerNorm_0"]["scale"]),
        "pre_encoder_layer_norm_bias":
            np.asarray(p["LayerNorm_0"]["bias"]),
        "pooled_fc.w_0": np.asarray(p["pooler"]["kernel"]),
        "pooled_fc.b_0": np.asarray(p["pooler"]["bias"]),
    }
    for i in range(cfg.num_layers):
        att = f"encoder_layer_{i}_multi_head_att"
        a = p[f"attn_{i}"]
        for proj in ("query", "key", "value"):
            out[f"{att}_{proj}_fc.w_0"] = np.asarray(
                a[proj]["kernel"]).reshape(H, H)
            out[f"{att}_{proj}_fc.b_0"] = np.asarray(
                a[proj]["bias"]).reshape(H)
        out[f"{att}_output_fc.w_0"] = np.asarray(
            a["out"]["kernel"]).reshape(H, H)
        out[f"{att}_output_fc.b_0"] = np.asarray(a["out"]["bias"])
        for tag, idx in (("post_att", 2 * i + 1), ("post_ffn", 2 * i + 2)):
            out[f"encoder_layer_{i}_{tag}_layer_norm_scale"] = \
                np.asarray(p[f"LayerNorm_{idx}"]["scale"])
            out[f"encoder_layer_{i}_{tag}_layer_norm_bias"] = \
                np.asarray(p[f"LayerNorm_{idx}"]["bias"])
        out[f"encoder_layer_{i}_ffn_fc_0.w_0"] = np.asarray(
            p[f"Dense_{2 * i}"]["kernel"])
        out[f"encoder_layer_{i}_ffn_fc_0.b_0"] = np.asarray(
            p[f"Dense_{2 * i}"]["bias"])
        out[f"encoder_layer_{i}_ffn_fc_1.w_0"] = np.asarray(
            p[f"Dense_{2 * i + 1}"]["kernel"])
        out[f"encoder_layer_{i}_ffn_fc_1.b_0"] = np.asarray(
            p[f"Dense_{2 * i + 1}"]["bias"])
    return out
