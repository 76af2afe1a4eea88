"""Masked flash attention as a Pallas TPU kernel.

Used by the HRI transformer (hri/transformer.py) in place of the
materialize-scores path: the reference's Paddle graph (and our fallback)
builds the full (B,H,T,S) score tensor (transformer.py:40-64); this
kernel computes attention with the online-softmax (flash) recurrence in
VMEM, never writing scores to HBM. Masking follows the reference's
semantics: scores = s·m − 1e10·(1−m), and the softmax output is
re-masked so fully-masked rows produce zeros.

The grid runs (batch·heads, query blocks); K/V are streamed in source
blocks. Interpret mode makes the same kernel runnable on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e10


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_s: int,
                 src_len: int, scale: float):
    """One (bh, q-block) program: iterate source blocks with online
    softmax. Ref shapes: q (1,BT,hd), k/v (1,S,hd), mask (1,BT,S)."""
    q = q_ref[0] * scale
    bt, hd = q.shape

    def body(i, carry):
        acc, m_prev, l_prev = carry
        s0 = i * block_s
        k = k_ref[0, pl.ds(s0, block_s), :]
        v = v_ref[0, pl.ds(s0, block_s), :]
        m = mask_ref[0, :, pl.ds(s0, block_s)]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        s = s * m + NEG_INF * (1.0 - m)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)
        p = p * m                       # reference re-masks the weights
        alpha = jnp.exp(m_prev - m_cur)
        l_cur = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_cur, l_cur

    n_blocks = src_len // block_s
    acc0 = jnp.zeros((bt, hd), jnp.float32)
    m0 = jnp.full((bt, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bt, 1), jnp.float32)
    acc, m_fin, l_fin = jax.lax.fori_loop(0, n_blocks, body,
                                          (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l_fin, 1e-20)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "block_s",
                                             "interpret"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: jnp.ndarray, block_t: int = 128,
                    block_s: int = 128,
                    interpret: bool = False) -> jnp.ndarray:
    """q (B,H,T,hd), k/v (B,H,S,hd), mask (B,T,S) → (B,H,T,hd).

    Pads T/S up to block multiples (padded keys get mask 0 so they
    contribute nothing; padded queries are sliced away).
    """
    B, H, T, hd = q.shape
    S = k.shape[2]
    Tp = -(-T // block_t) * block_t
    Sp = -(-S // block_s) * block_s

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    mp = jnp.pad(mask, ((0, 0), (0, Tp - T), (0, Sp - S)))

    qf = qp.reshape(B * H, Tp, hd)
    kf = kp.reshape(B * H, Sp, hd)
    vf = vp.reshape(B * H, Sp, hd)
    mf = jnp.repeat(mp, H, axis=0)      # (B*H, Tp, Sp)

    grid = (B * H, Tp // block_t)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, block_s=block_s, src_len=Sp,
                          scale=hd ** -0.5),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_t, hd), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, Sp, hd), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, Sp, hd), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, block_t, Sp), lambda b, t: (b, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_t, hd), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, hd), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, mf)
    return out.reshape(B, H, Tp, hd)[:, :, :T, :]


def reference_attention(q, k, v, mask):
    """Materialized-scores reference (transformer.py:40-64 semantics)."""
    hd = q.shape[-1]
    s = jnp.einsum("bhtd,bhsd->bhts", q, k) * (hd ** -0.5)
    m = mask[:, None, :, :]
    s = s * m + NEG_INF * (1.0 - m)
    w = jax.nn.softmax(s, axis=-1) * m
    return jnp.einsum("bhts,bhsd->bhtd", w, v)
