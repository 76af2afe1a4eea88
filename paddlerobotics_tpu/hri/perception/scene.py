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

    def _forward(self, params, images):
        """(params, images) → (boxes (B,N,4), scores (B,N,C), fm)."""
        preds, fm = self.model.apply(params, images, mutable=False)
        boxes, scores = yolo.decode_predictions(
            preds, self.anchors, self.num_classes, self.input_size)
        return boxes, scores, fm

    def get_instances_with_feats(self, params, images: jnp.ndarray,
                                 score_threshold: float = 0.25,
                                 person_only: bool = True) -> Instances:
        """images (B,S,S,3) in [0,1] → Instances with (B,K,...) leaves."""
        boxes, scores, fm = self._forward(params, images)

        def per_image(b, s, f):
            if person_only:
                cls_score = s[:, PERSON_CLASS]
                cls_id = jnp.zeros(s.shape[0], jnp.int32)
            else:
                cls_score = jnp.max(s, axis=-1)
                cls_id = jnp.argmax(s, axis=-1)
            kb, ks, valid, kidx = yolo.nms_topk(
                b, cls_score, max_dets=MAX_INSTANCES,
                score_threshold=score_threshold, return_indices=True)
            feats = roi_align.roi_align(
                f, kb, output_size=5,
                spatial_scale=f.shape[0] / self.input_size)
            gap = jnp.mean(feats, axis=(1, 2))            # (K,C)
            pos = utils.get_bbox_pos_emb(
                kb, self.input_size, self.input_size)     # (K,2,5,5)
            tokens = jnp.concatenate(
                [gap, pos.reshape(pos.shape[0], -1)], axis=-1)
            tokens = tokens * valid[:, None]
            # class ids gathered at the NMS-kept indices (person_only
            # keeps them 0 anyway)
            kept_cls = jnp.where(valid, cls_id[kidx], 0)
            return Instances(kb, ks, kept_cls, valid, tokens, feats)

        return jax.vmap(per_image)(boxes, scores, fm)

    def get_feature_map(self, params, images):
        _, _, fm = self._forward(params, images)
        return fm

    def get_instances(self, params, images, **kw):
        inst = self.get_instances_with_feats(params, images, **kw)
        return inst.boxes, inst.scores, inst.valid


class DarknetSceneSensor(SceneSensor):
    """SceneSensor running a cfg-built darknet network, so imported
    `.weights` (hri/perception/darknet.py, the counterpart of the
    reference's tools/darknet_to_keras.py conversion chain) drive the
    SAME detect→RoIAlign→token pipeline as the native flax YOLO.

    `fm_layer` picks which layer output is the RoIAlign feature map
    (cfg section index); default auto-selects the deepest layer whose
    channel count is 512 (the reference taps a 512-channel map — token
    dim 562 = 512 GAP + 50 pos-emb, infer_v3.cpp:578-681).
    """

    def __init__(self, sections, input_size: int | None = None,
                 fm_layer: int | None = None):
        from paddlerobotics_tpu.hri.perception import darknet

        self.sections = sections
        if input_size is None:                 # [net] width
            net_opt = dict(sections[0][1]) if sections else {}
            input_size = int(net_opt.get("width", 416))
        self.input_size = input_size
        self.model = darknet.DarknetNet(sections)
        self.metas = darknet.yolo_meta(sections)
        self.num_classes = self.metas[0]["classes"] if self.metas else 80
        self._fm_layer = fm_layer

    def init(self, rng):
        img = jnp.zeros((1, self.input_size, self.input_size, 3))
        params = self.model.init(rng, img)
        if self._fm_layer is None:
            _, outs = self.model.apply(params, img, mutable=False)
            picks = [i for i, o in enumerate(outs)
                     if o.ndim == 4 and o.shape[-1] == 512]
            self._fm_layer = picks[-1] if picks else len(outs) - 1
        return params

    def _forward(self, params, images):
        if self._fm_layer is None:
            raise RuntimeError("call init() first (fm_layer auto-pick)")
        yolo_outs, outs = self.model.apply(params, images, mutable=False)
        all_b, all_s = [], []
        for p, meta in zip(yolo_outs, self.metas):
            b, s = yolo.decode_predictions(
                [p], [meta["anchors"]], meta["classes"],
                self.input_size, scale_xy=meta["scale_xy"])
            all_b.append(b)
            all_s.append(s)
        return (jnp.concatenate(all_b, axis=1),
                jnp.concatenate(all_s, axis=1), outs[self._fm_layer])
