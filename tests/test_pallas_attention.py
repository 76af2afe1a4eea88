"""Flash-attention kernel vs materialized reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerobotics_tpu.hri.transformer import (frame_ids_to_attn_mask,
                                                merge_padding_mask)
from paddlerobotics_tpu.ops.pallas.attention import (flash_attention,
                                                     reference_attention)


def test_flash_matches_reference_block_causal():
    B, H, T, hd = 2, 4, 40, 16
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, T, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, T, hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, T, hd), jnp.float32)
    # block-causal frame mask + a padding hole
    fids = jnp.repeat(jnp.arange(1, 5), 10)[None].repeat(B, 0)
    pad = jnp.ones((B, T)).at[:, 7:10].set(0.0)
    mask = merge_padding_mask(frame_ids_to_attn_mask(fids), pad)

    ref = reference_attention(q, k, v, mask)
    out = flash_attention(q, k, v, mask, block_t=16, block_s=16,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_fully_masked_rows_zero():
    B, H, T, hd = 1, 2, 8, 8
    q = jnp.ones((B, H, T, hd))
    k = jnp.ones((B, H, T, hd))
    v = jnp.ones((B, H, T, hd))
    mask = jnp.zeros((B, T, T)).at[:, :4, :4].set(1.0)
    out = flash_attention(q, k, v, mask, block_t=8, block_s=8,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out[:, :, 4:]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, :, :4]), 1.0, atol=1e-5)
