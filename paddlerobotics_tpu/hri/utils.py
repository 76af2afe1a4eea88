"""HRI perception utilities: bbox positional embeddings, letterbox
preprocessing, box helpers, cosine similarity.

Rebuild of HRI/TFVT_HRI/perception/common/utils.py in batched JAX:
- sin bbox pos-emb (utils.py:251-279): a bbox is encoded as a 2×5×5
  grid of sin-warped center-relative coordinates → 50-d flat;
- YOLO letterbox resize constants (utils.py:119-145 /
  jetson/infer_v3.cpp:189-228): scale to fit 416×416, pad with 0.5 gray;
- expand_boxes, IoU, cosine similarity.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def get_bbox_pos_emb(bbox: jnp.ndarray, im_h: float, im_w: float,
                     emb_h: int = 5, emb_w: int = 5) -> jnp.ndarray:
    """Sin positional embedding of bbox(es) relative to image center.

    bbox (...,4) xyxy → (...,2,emb_h,emb_w); flatten to 2·h·w = 50 dims.
    Batched JAX version of utils.py:251-279 ('sin' mode).
    """
    xmin, ymin, xmax, ymax = (bbox[..., 0], bbox[..., 1],
                              bbox[..., 2], bbox[..., 3])
    sx = lambda v: (v - im_w / 2.0) / (im_w / 2.0) * (np.pi / 2.0)
    sy = lambda v: (v - im_h / 2.0) / (im_h / 2.0) * (np.pi / 2.0)
    xmin, xmax = sx(xmin), sx(xmax)
    ymin, ymax = sy(ymin), sy(ymax)
    tx = jnp.linspace(0.0, 1.0, emb_w)
    ty = jnp.linspace(0.0, 1.0, emb_h)
    x_pos = jnp.sin(xmin[..., None] + (xmax - xmin)[..., None] * tx)
    y_pos = jnp.sin(ymin[..., None] + (ymax - ymin)[..., None] * ty)
    x_emb = jnp.broadcast_to(x_pos[..., None, :],
                             x_pos.shape[:-1] + (emb_h, emb_w))
    y_emb = jnp.broadcast_to(y_pos[..., :, None],
                             y_pos.shape[:-1] + (emb_h, emb_w))
    return jnp.stack([x_emb, y_emb], axis=-3)


def letterbox_params(im_h: int, im_w: int, target: int = 416):
    """Scale + offsets for aspect-preserving letterbox (yolov4 preprocess,
    utils.py:119-145). Returns (scale, new_h, new_w, top, left)."""
    scale = min(target / im_h, target / im_w)
    new_h, new_w = int(im_h * scale), int(im_w * scale)
    top = (target - new_h) // 2
    left = (target - new_w) // 2
    return scale, new_h, new_w, top, left


def letterbox_image(img: np.ndarray, target: int = 416,
                    pad_value: float = 0.5) -> np.ndarray:
    """HWC float image in [0,1] → (target,target,C) letterboxed (host-side
    preprocessing; resize via cv2 when available, else numpy nearest)."""
    im_h, im_w = img.shape[:2]
    scale, new_h, new_w, top, left = letterbox_params(im_h, im_w, target)
    try:
        import cv2

        resized = cv2.resize(img, (new_w, new_h))
    except Exception:
        yi = (np.arange(new_h) / scale).astype(int).clip(0, im_h - 1)
        xi = (np.arange(new_w) / scale).astype(int).clip(0, im_w - 1)
        resized = img[yi][:, xi]
    out = np.full((target, target) + img.shape[2:], pad_value, img.dtype)
    out[top:top + new_h, left:left + new_w] = resized
    return out


def unletterbox_boxes(boxes: np.ndarray, im_h: int, im_w: int,
                      target: int = 416) -> np.ndarray:
    """Map xyxy boxes from letterbox space back to original image coords."""
    scale, new_h, new_w, top, left = letterbox_params(im_h, im_w, target)
    out = boxes.copy().astype(np.float64)
    out[..., [0, 2]] = (out[..., [0, 2]] - left) / scale
    out[..., [1, 3]] = (out[..., [1, 3]] - top) / scale
    out[..., [0, 2]] = out[..., [0, 2]].clip(0, im_w - 1)
    out[..., [1, 3]] = out[..., [1, 3]].clip(0, im_h - 1)
    return out


def expand_boxes(boxes: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Scale boxes about their centers (utils.py:226-249)."""
    x_c = (boxes[..., 0] + boxes[..., 2]) * 0.5
    y_c = (boxes[..., 1] + boxes[..., 3]) * 0.5
    w_half = (boxes[..., 2] - boxes[..., 0]) * 0.5 * scale
    h_half = (boxes[..., 3] - boxes[..., 1]) * 0.5 * scale
    return jnp.stack([x_c - w_half, y_c - h_half,
                      x_c + w_half, y_c + h_half], axis=-1)


def iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU, a (N,4) × b (M,4) xyxy → (N,M)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    return inter / jnp.maximum(area_a + area_b - inter, 1e-9)


def cosine_sim(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    na = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-9)
    nb = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-9)
    return na @ nb.T
