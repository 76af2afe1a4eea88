"""Online proactive-greeting service pipeline (Python host).

Rebuild of server/attn_program.py (AttnModelServiceProgram: detector →
visual tokenizer → attention controller as three fluid programs) and the
decision logic of jetson/infer_v3.cpp: a 10-frame sliding window of
visual tokens with per-frame ids, incremental attention inference,
trigger thresholding, near-field and lag business rules, salutation
selection, and a JSON response.

TPU-native: the three reference programs fuse into two jitted calls
(detect+tokenize, attend+decide); the C++ thread pipeline that hides
Paddle latency (infer_v3.cpp:1736-1756) is unnecessary on-device but the
same structure is available natively in runtime_cpp/ for host-side
serving.
"""

from __future__ import annotations

import dataclasses
import json
import time
from collections import deque
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from paddlerobotics_tpu.hri import actions as actions_mod
from paddlerobotics_tpu.hri.attention_ctrl import (AttentionController,
                                                   AttnCtrlConfig,
                                                   top_k_sampling)
from paddlerobotics_tpu.hri.perception.scene import (MAX_INSTANCES,
                                                     SceneSensor)


@dataclasses.dataclass
class ServiceConfig:
    num_frames: int = 10
    tokens_per_frame: int = MAX_INSTANCES
    trigger_threshold: float = 0.8      # per-variant 0.65–0.9
    temperature: float = 1.0
    top_k: int = 5
    near_field_frac: float = 0.4        # bbox height fraction ⇒ near field
    lag_skip_ms: float = 500.0          # drop frames older than this
    wakeup_cooldown_s: float = 5.0      # suppress re-trigger window


class ProactiveGreetingService:
    """Stateful host-side service around jitted TPU programs.

    frame → detect+tokenize → window append → attention → business rules.
    """

    def __init__(self, cfg: ServiceConfig,
                 scene: SceneSensor, scene_params,
                 ctrl_cfg: AttnCtrlConfig, ctrl_params,
                 action_catalog: Optional[List] = None,
                 rng=None):
        self.cfg = cfg
        self.scene = scene
        self.scene_params = scene_params
        self.ctrl = AttentionController(ctrl_cfg)
        self.ctrl_cfg = ctrl_cfg
        self.ctrl_params = ctrl_params
        self.catalog = action_catalog or []
        self.rng = rng or jax.random.key(0)

        # sliding windows (deques like infer_v3.cpp:110-114)
        self.token_window: deque = deque(maxlen=cfg.num_frames)
        self.valid_window: deque = deque(maxlen=cfg.num_frames)
        self.box_window: deque = deque(maxlen=cfg.num_frames)
        self.frame_counter = 0
        self.last_trigger_time = -1e9

        # params flow as ARGUMENTS, never closure captures — captured
        # params become HLO constants (YOLOv4: ~250 MB) and blow the
        # remote-compile request limit (HTTP 413) on tunnel-attached
        # chips (same rule as scripts_dev/hri_convergence.py eval)
        self._detect = jax.jit(
            lambda params, img: self.scene.get_instances_with_feats(
                params, img))
        self._attend = jax.jit(self._attend_impl)

    def _attend_impl(self, params, tokens, frame_ids, padding):
        return self.ctrl.apply(params, {"visual_tokens": tokens},
                               frame_ids, padding)

    # -- per-frame processing -------------------------------------------------

    def process_frame(self, image: np.ndarray,
                      timestamp: Optional[float] = None) -> dict:
        """image (416,416,3) in [0,1] → decision dict (JSON-able),
        mirroring ConvertPredToJsons (infer_v3.cpp:750-823)."""
        now = time.time()
        timestamp = timestamp if timestamp is not None else now
        if (now - timestamp) * 1000.0 > self.cfg.lag_skip_ms:
            return {"triggered": False, "reason": "lag_skip"}

        inst = self._detect(self.scene_params, jnp.asarray(image)[None])
        tokens = np.asarray(inst.tokens[0])          # (K,562)
        valid = np.asarray(inst.valid[0])
        boxes = np.asarray(inst.boxes[0])
        self.frame_counter += 1
        self.token_window.append(tokens)
        self.valid_window.append(valid)
        self.box_window.append(boxes)
        if len(self.token_window) < self.cfg.num_frames:
            return {"triggered": False, "reason": "window_filling"}

        nf, tpf = self.cfg.num_frames, self.cfg.tokens_per_frame
        win_tokens = jnp.asarray(np.stack(self.token_window)).reshape(
            1, nf * tpf, -1)
        win_valid = jnp.asarray(np.stack(self.valid_window)).reshape(
            1, nf * tpf).astype(jnp.float32)
        frame_ids = jnp.repeat(jnp.arange(1, nf + 1), tpf)[None]

        out = self._attend(self.ctrl_params, win_tokens, frame_ids,
                           win_valid)
        trigger = float(jax.nn.sigmoid(out["trigger_logits"][0, -1]))
        obj_scores = np.asarray(
            jax.nn.sigmoid(out["obj_logits"][0, -tpf:])) * \
            np.asarray(self.valid_window[-1], np.float32)

        decision = {"triggered": False, "trigger_score": trigger}
        if trigger < self.cfg.trigger_threshold:
            return decision
        # wakeup cooldown (infer_v3.cpp business rules)
        if now - self.last_trigger_time < self.cfg.wakeup_cooldown_s:
            decision["reason"] = "cooldown"
            return decision

        # near-field check (infer_v3.cpp:274-284): target bbox must be
        # large enough in the frame.
        target = int(np.argmax(obj_scores))
        box = self.box_window[-1][target]
        height_frac = (box[3] - box[1]) / 416.0
        if height_frac < self.cfg.near_field_frac * 0.25:
            decision["reason"] = "far_field"
            return decision

        self.rng, k = jax.random.split(self.rng)
        act_id = int(top_k_sampling(
            k, out["act_logits"][:, -1:, :], self.cfg.temperature,
            self.cfg.top_k)[0, 0])

        self.last_trigger_time = now
        decision.update({
            "triggered": True,
            "target_bbox": [float(v) for v in box],
            "target_obj_score": float(obj_scores[target]),
            "action_id": act_id,
        })
        if self.catalog and act_id < len(self.catalog):
            a = self.catalog[act_id]
            decision.update({"action": a.act, "expression": a.exp,
                             "utterance": a.utterance,
                             "movement": a.movement})
        return decision

    def to_json(self, decision: dict) -> str:
        return json.dumps(decision)
