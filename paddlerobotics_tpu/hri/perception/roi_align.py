"""RoIAlign in pure JAX (bilinear, sampling_ratio configurable).

Rebuild of the reference's RoIAlign usage
(perception/scene/ppdet_ops.py:104-203 and the zero-copy C++ path
jetson/infer_v3.cpp:578-681): extracts fixed-size per-ROI features from
a feature map for the visual tokenizer. Fully vectorized gather +
bilinear interpolation; vmaps over ROIs and batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def roi_align(fm: jnp.ndarray, rois: jnp.ndarray,
              output_size: int = 5, spatial_scale: float = 1.0 / 32.0,
              sampling_ratio: int = 2) -> jnp.ndarray:
    """fm (H,W,C); rois (R,4) xyxy in input-image coords →
    (R, output_size, output_size, C)."""
    H, W, C = fm.shape

    def one_roi(roi):
        x0, y0, x1, y1 = roi * spatial_scale
        rw = jnp.maximum(x1 - x0, 1.0)
        rh = jnp.maximum(y1 - y0, 1.0)
        bin_w = rw / output_size
        bin_h = rh / output_size
        # sampling grid: output_size × sampling_ratio points per axis
        n = output_size * sampling_ratio
        xs = x0 + (jnp.arange(n) + 0.5) * rw / n
        ys = y0 + (jnp.arange(n) + 0.5) * rh / n
        vals = _bilinear(fm, ys, xs)                 # (n, n, C)
        vals = vals.reshape(output_size, sampling_ratio,
                            output_size, sampling_ratio, C)
        return vals.mean(axis=(1, 3))

    return jax.vmap(one_roi)(rois)


def _bilinear(fm: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray):
    """Sample fm (H,W,C) at grid ys × xs → (len(ys), len(xs), C)."""
    H, W, _ = fm.shape
    y = jnp.clip(ys, 0.0, H - 1.0)
    x = jnp.clip(xs, 0.0, W - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (y - y0)[:, None, None]
    wx = (x - x0)[None, :, None]
    f00 = fm[y0][:, x0]
    f01 = fm[y0][:, x1]
    f10 = fm[y1][:, x0]
    f11 = fm[y1][:, x1]
    return (f00 * (1 - wy) * (1 - wx) + f01 * (1 - wy) * wx +
            f10 * wy * (1 - wx) + f11 * wy * wx)
