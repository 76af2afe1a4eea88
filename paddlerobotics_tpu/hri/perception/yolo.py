"""YOLOv3/YOLOv4 detectors in flax, with fixed-shape decode + NMS.

Rebuild of HRI/TFVT_HRI/perception/scene/ (yolo_v4.py:16-291 building the
inference graph + box correction; ppdet_anchor_head.py:32-302 YOLOv3
head). The reference runs an x2paddle-converted static graph; here the
network is native flax: CSPDarknet53 + SPP + PANet neck for v4,
Darknet53 + FPN-style neck for v3, anchor decode with sigmoid xy /
exp wh, class-agnostic top-k + IoU NMS — all fixed shapes, so detection
jits and batches on TPU.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerobotics_tpu.hri.perception.backbones import (ConvBN,
                                                         CSPDarknet53,
                                                         Darknet53)

# COCO anchors (yolov4.cfg / ppdet yolov3 defaults), per scale small→large
YOLOV4_ANCHORS = (
    ((12, 16), (19, 36), (40, 28)),
    ((36, 75), (76, 55), (72, 146)),
    ((142, 110), (192, 243), (459, 401)),
)
YOLOV3_ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)


class SPP(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        pools = [x]
        for k in (5, 9, 13):
            pools.append(nn.max_pool(x, (k, k), (1, 1), padding="SAME"))
        return jnp.concatenate(pools[::-1], axis=-1)


def _conv5(h, feats, train):
    h = ConvBN(feats, 1)(h, train)
    h = ConvBN(feats * 2, 3)(h, train)
    h = ConvBN(feats, 1)(h, train)
    h = ConvBN(feats * 2, 3)(h, train)
    return ConvBN(feats, 1)(h, train)


def _upsample(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), "nearest")


class YOLOv4Neck(nn.Module):
    """SPP + PANet over (C3, C4, C5)."""

    @nn.compact
    def __call__(self, c3, c4, c5, train: bool = False):
        h5 = ConvBN(512, 1)(c5, train)
        h5 = ConvBN(1024, 3)(h5, train)
        h5 = ConvBN(512, 1)(h5, train)
        h5 = SPP()(h5, train)
        h5 = _conv5(h5, 512, train)

        up4 = _upsample(ConvBN(256, 1)(h5, train))
        h4 = jnp.concatenate([ConvBN(256, 1)(c4, train), up4], axis=-1)
        h4 = _conv5(h4, 256, train)

        up3 = _upsample(ConvBN(128, 1)(h4, train))
        h3 = jnp.concatenate([ConvBN(128, 1)(c3, train), up3], axis=-1)
        h3 = _conv5(h3, 128, train)

        d4 = ConvBN(256, 3, 2)(h3, train)
        h4 = _conv5(jnp.concatenate([d4, h4], axis=-1), 256, train)
        d5 = ConvBN(512, 3, 2)(h4, train)
        h5 = _conv5(jnp.concatenate([d5, h5], axis=-1), 512, train)
        return h3, h4, h5


class YOLOHead(nn.Module):
    num_classes: int
    num_anchors: int = 3

    @nn.compact
    def __call__(self, feats, train: bool = False):
        outs = []
        for i, h in enumerate(feats):
            c = h.shape[-1]
            h = ConvBN(c * 2, 3)(h, train)
            h = nn.Conv(self.num_anchors * (5 + self.num_classes), (1, 1))(h)
            outs.append(h)
        return outs


class YOLOv4(nn.Module):
    """CSPDarknet53 + SPP/PAN + heads; also exposes the C5-level feature
    map the reference RoIAligns over (scene/eval.py get_feature_map)."""

    num_classes: int = 80

    @nn.compact
    def __call__(self, img, train: bool = False):
        c3, c4, c5 = CSPDarknet53()(img, train)
        h3, h4, h5 = YOLOv4Neck()(c3, c4, c5, train)
        preds = YOLOHead(self.num_classes)([h3, h4, h5], train)
        return preds, h5     # h5 (stride 32) is the RoI feature map


class YOLOv3(nn.Module):
    num_classes: int = 80

    @nn.compact
    def __call__(self, img, train: bool = False):
        c3, c4, c5 = Darknet53()(img, train)
        h5 = _conv5(c5, 512, train)
        up4 = _upsample(ConvBN(256, 1)(h5, train))
        h4 = _conv5(jnp.concatenate([up4, c4], axis=-1), 256, train)
        up3 = _upsample(ConvBN(128, 1)(h4, train))
        h3 = _conv5(jnp.concatenate([up3, c3], axis=-1), 128, train)
        preds = YOLOHead(self.num_classes)([h3, h4, h5], train)
        return preds, h5


def decode_predictions(preds: Sequence[jnp.ndarray], anchors,
                       num_classes: int, input_size: int = 416,
                       scale_xy: float = 1.0):
    """Raw head outputs → (boxes xyxy (B,N,4), scores (B,N,C)).

    Anchor decode: xy = (sigmoid(tx)·s − (s−1)/2 + grid)·stride,
    wh = anchor·exp(tw); obj/cls via sigmoid (ppdet_anchor_head.py /
    yolo_v4.py box correction semantics).
    """
    all_boxes, all_scores = [], []
    for p, anc in zip(preds, anchors):
        B, H, W, _ = p.shape
        A = len(anc)
        p = p.reshape(B, H, W, A, 5 + num_classes)
        stride = input_size // W
        gx = jnp.arange(W)[None, None, :, None]
        gy = jnp.arange(H)[None, :, None, None]
        sx = jax.nn.sigmoid(p[..., 0]) * scale_xy - (scale_xy - 1) / 2
        sy = jax.nn.sigmoid(p[..., 1]) * scale_xy - (scale_xy - 1) / 2
        cx = (gx + sx) * stride
        cy = (gy + sy) * stride
        aw = jnp.asarray([a[0] for a in anc])[None, None, None, :]
        ah = jnp.asarray([a[1] for a in anc])[None, None, None, :]
        w = aw * jnp.exp(jnp.clip(p[..., 2], -10, 8))
        h = ah * jnp.exp(jnp.clip(p[..., 3], -10, 8))
        obj = jax.nn.sigmoid(p[..., 4:5])
        cls = jax.nn.sigmoid(p[..., 5:])
        boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                          axis=-1)
        all_boxes.append(boxes.reshape(B, -1, 4))
        all_scores.append((obj * cls).reshape(B, -1, num_classes))
    return (jnp.concatenate(all_boxes, axis=1),
            jnp.concatenate(all_scores, axis=1))


def nms_topk(boxes: jnp.ndarray, scores: jnp.ndarray,
             max_dets: int = 20, iou_threshold: float = 0.45,
             score_threshold: float = 0.25, return_indices: bool = False):
    """Fixed-shape class-agnostic NMS for one image.

    boxes (N,4), scores (N,) best-class score → (boxes (K,4),
    scores (K,), valid (K,)[, kept_idx (K,) indices into the input]).
    Greedy suppression over the top-K candidates only (K = max_dets),
    fully jittable.
    """
    N = boxes.shape[0]
    K = max_dets
    top_scores, top_idx = jax.lax.top_k(scores, min(4 * K, N))
    top_boxes = boxes[top_idx]

    def body(i, carry):
        keep_boxes, keep_scores, keep_idx, n_kept, suppressed = carry
        s = jnp.where(suppressed, -1.0, top_scores)
        j = jnp.argmax(s)
        ok = (s[j] >= score_threshold) & (n_kept < K)
        cand = top_boxes[j]
        keep_boxes = jnp.where(ok, keep_boxes.at[n_kept].set(cand),
                               keep_boxes)
        keep_scores = jnp.where(ok, keep_scores.at[n_kept].set(s[j]),
                                keep_scores)
        keep_idx = jnp.where(ok, keep_idx.at[n_kept].set(top_idx[j]),
                             keep_idx)
        iou = _iou_one(cand, top_boxes)
        suppressed = suppressed | (ok & (iou > iou_threshold)) | \
            (jnp.arange(top_boxes.shape[0]) == j)
        return keep_boxes, keep_scores, keep_idx, \
            n_kept + ok.astype(jnp.int32), suppressed

    init = (jnp.zeros((K, 4)), jnp.zeros(K), jnp.zeros(K, jnp.int32),
            jnp.zeros((), jnp.int32), jnp.zeros(top_boxes.shape[0], bool))
    keep_boxes, keep_scores, keep_idx, n_kept, _ = jax.lax.fori_loop(
        0, K, body, init)
    valid = jnp.arange(K) < n_kept
    if return_indices:
        return keep_boxes, keep_scores, valid, keep_idx
    return keep_boxes, keep_scores, valid


def nms_topk_multiclass(boxes: jnp.ndarray, scores: jnp.ndarray,
                        max_dets: int = 20, iou_threshold: float = 0.45,
                        score_threshold: float = 0.25):
    """Per-class NMS (the reference's multiclass_nms semantics,
    yolo_v4.py box post-processing): suppression only applies within a
    class. Implemented exactly via the coordinate-offset trick — each
    class's boxes are translated to a disjoint region so one agnostic
    pass equals C per-class passes.

    boxes (N,4), scores (N,C) → (boxes (K,4), scores (K,),
    class_ids (K,), valid (K,)).
    """
    N, C = scores.shape
    lo = jnp.min(boxes)
    b0 = boxes - lo                                       # coords ≥ 0
    span = jnp.max(b0) + 1.0
    flat_scores = scores.reshape(-1)                      # (N*C,)
    cls_ids = jnp.tile(jnp.arange(C), (N, 1)).reshape(-1)
    box_rep = jnp.repeat(b0, C, axis=0)                   # (N*C,4)
    offset = (cls_ids.astype(boxes.dtype) * span)[:, None]
    kept_b, kept_s, valid = nms_topk(box_rep + offset, flat_scores,
                                     max_dets, iou_threshold,
                                     score_threshold)
    # recover class ids and un-offset the boxes
    kc = jnp.clip(jnp.floor(kept_b[:, 0] / span), 0, C - 1).astype(jnp.int32)
    kc = jnp.where(valid, kc, 0)
    kept_b = kept_b - (kc.astype(boxes.dtype) * span)[:, None] + lo
    return kept_b, kept_s, kc, valid


def _iou_one(box, boxes):
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    a = (box[2] - box[0]) * (box[3] - box[1])
    b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / jnp.maximum(a + b - inter, 1e-9)
