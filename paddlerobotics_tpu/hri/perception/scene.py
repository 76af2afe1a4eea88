"""Scene sensor: detector + visual tokenizer.

Rebuild of HRI/TFVT_HRI/perception/scene/eval.py (SceneSensor:
get_instances / get_feature_map / get_instances_with_feats — Paddle
inference wrappers with LoD decode) and the visual-token assembly of
jetson/infer_v3.cpp:578-681: per detection, GAP of the RoIAligned
feature map (512-d) + sin bbox pos-emb (50-d) → 562-d token; up to 20
instances per frame; padding mask for absent slots.

Everything below is one jittable function of (params, image batch) —
detector, NMS, RoIAlign and token assembly fuse into a single program
(the reference pipelines three processes/threads to hide the same
latency).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from paddlerobotics_tpu.hri.perception import roi_align, yolo
from paddlerobotics_tpu.hri import utils

MAX_INSTANCES = 20       # attention_ctrl tokens_per_frame
TOKEN_DIM = 562          # 512 GAP + 50 pos emb
PERSON_CLASS = 0         # COCO person


class Instances(NamedTuple):
    boxes: jnp.ndarray    # (K,4) xyxy in input coords
    scores: jnp.ndarray   # (K,)
    classes: jnp.ndarray  # (K,)
    valid: jnp.ndarray    # (K,) bool
    tokens: jnp.ndarray   # (K,TOKEN_DIM) visual tokens
    feats: jnp.ndarray    # (K,5,5,C) RoIAligned feature maps


class SceneSensor:
    """Holds the detector module + params; `detect` is pure/jittable."""

    def __init__(self, num_classes: int = 80, input_size: int = 416,
                 arch: str = "yolov4"):
        self.num_classes = num_classes
        self.input_size = input_size
        self.arch = arch
        self.model = (yolo.YOLOv4(num_classes) if arch == "yolov4"
                      else yolo.YOLOv3(num_classes))
        self.anchors = (yolo.YOLOV4_ANCHORS if arch == "yolov4"
                        else yolo.YOLOV3_ANCHORS)

    def init(self, rng):
        img = jnp.zeros((1, self.input_size, self.input_size, 3))
        return self.model.init(rng, img)

    def get_instances_with_feats(self, params, images: jnp.ndarray,
                                 score_threshold: float = 0.25,
                                 person_only: bool = True) -> Instances:
        """images (B,S,S,3) in [0,1] → Instances with (B,K,...) leaves."""
        preds, fm = self.model.apply(params, images,
                                     mutable=False)
        boxes, scores = yolo.decode_predictions(
            preds, self.anchors, self.num_classes, self.input_size)

        def per_image(b, s, f):
            if person_only:
                cls_score = s[:, PERSON_CLASS]
                cls_id = jnp.zeros(s.shape[0], jnp.int32)
            else:
                cls_score = jnp.max(s, axis=-1)
                cls_id = jnp.argmax(s, axis=-1)
            kb, ks, valid = yolo.nms_topk(
                b, cls_score, max_dets=MAX_INSTANCES,
                score_threshold=score_threshold)
            feats = roi_align.roi_align(
                f, kb, output_size=5,
                spatial_scale=f.shape[0] / self.input_size)
            gap = jnp.mean(feats, axis=(1, 2))            # (K,C)
            pos = utils.get_bbox_pos_emb(
                kb, self.input_size, self.input_size)     # (K,2,5,5)
            tokens = jnp.concatenate(
                [gap, pos.reshape(pos.shape[0], -1)], axis=-1)
            tokens = tokens * valid[:, None]
            # class id of kept boxes is person (or argmax) — keep 0s
            return Instances(kb, ks, cls_id[:MAX_INSTANCES], valid,
                             tokens, feats)

        return jax.vmap(per_image)(boxes, scores, fm)

    def get_feature_map(self, params, images):
        _, fm = self.model.apply(params, images, mutable=False)
        return fm

    def get_instances(self, params, images, **kw):
        inst = self.get_instances_with_feats(params, images, **kw)
        return inst.boxes, inst.scores, inst.valid
