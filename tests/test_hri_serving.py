"""End-to-end test of the Python serving service with a stub detector
and a real (tiny) attention controller."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerobotics_tpu.hri.attention_ctrl import (AttentionController,
                                                   AttnCtrlConfig)
from paddlerobotics_tpu.hri.perception.scene import Instances, MAX_INSTANCES
from paddlerobotics_tpu.hri.serving import (ProactiveGreetingService,
                                            ServiceConfig)
from paddlerobotics_tpu.hri import actions as actions_mod


class StubScene:
    """SceneSensor stand-in: one big centered detection per frame."""

    def get_instances_with_feats(self, params, images):
        B = images.shape[0]
        K = MAX_INSTANCES
        boxes = jnp.zeros((B, K, 4)).at[:, 0].set(
            jnp.asarray([150.0, 60.0, 260.0, 380.0]))
        scores = jnp.zeros((B, K)).at[:, 0].set(0.9)
        valid = jnp.zeros((B, K), bool).at[:, 0].set(True)
        tokens = jnp.zeros((B, K, 562)).at[:, 0].set(1.0)
        return Instances(boxes=boxes, scores=scores,
                         classes=jnp.zeros((B, K), jnp.int32),
                         valid=valid, tokens=tokens,
                         feats=jnp.zeros((B, K, 5, 5, 8)))


@pytest.fixture(scope="module")
def service():
    ctrl_cfg = AttnCtrlConfig(num_actions=7, num_frames=10,
                              tokens_per_frame=MAX_INSTANCES,
                              model_dim=32, num_decoder_blocks=1,
                              num_heads=2, ffn_dim=64, act_tr_dim=10)
    ctrl = AttentionController(ctrl_cfg)
    T = ctrl_cfg.num_frames * ctrl_cfg.tokens_per_frame
    params = ctrl.init(
        jax.random.key(0),
        {"visual_tokens": jnp.zeros((1, T, 562))},
        jnp.ones((1, T), jnp.int32), jnp.ones((1, T)))
    cfg = ServiceConfig(trigger_threshold=0.0,  # always trigger
                        wakeup_cooldown_s=0.0, near_field_frac=0.1)
    return ProactiveGreetingService(
        cfg, StubScene(), None, ctrl_cfg, params,
        action_catalog=[actions_mod.MultimodalAction("wave", "smile", "hi")
                        for _ in range(7)])


def test_window_fill_then_trigger(service):
    img = np.zeros((416, 416, 3), np.float32)
    decisions = []
    for i in range(12):
        decisions.append(service.process_frame(img))
    # first 9 frames: window filling
    assert decisions[0]["reason"] == "window_filling"
    # after the window is full a decision with a trigger score appears
    assert "trigger_score" in decisions[-1]
    triggered = [d for d in decisions if d.get("triggered")]
    assert triggered, decisions[-1]
    d = triggered[0]
    assert "action_id" in d and "target_bbox" in d
    assert d["utterance"] == "hi"
    js = service.to_json(d)
    assert "trigger_score" in js


def test_threshold_blocks_trigger():
    """High threshold → no trigger (score from an untrained net ~0.5)."""
    ctrl_cfg = AttnCtrlConfig(num_actions=7, num_frames=10,
                              tokens_per_frame=MAX_INSTANCES,
                              model_dim=32, num_decoder_blocks=1,
                              num_heads=2, ffn_dim=64, act_tr_dim=10)
    ctrl = AttentionController(ctrl_cfg)
    T = ctrl_cfg.num_frames * ctrl_cfg.tokens_per_frame
    params = ctrl.init(
        jax.random.key(0),
        {"visual_tokens": jnp.zeros((1, T, 562))},
        jnp.ones((1, T), jnp.int32), jnp.ones((1, T)))
    svc = ProactiveGreetingService(
        ServiceConfig(trigger_threshold=0.9999), StubScene(), None,
        ctrl_cfg, params)
    img = np.zeros((416, 416, 3), np.float32)
    for _ in range(12):
        d = svc.process_frame(img)
    assert not d["triggered"]


def test_offline_evaluator_sweep(service):
    from paddlerobotics_tpu.hri.eval_client import OfflineEvaluator

    ev = OfflineEvaluator(service)
    N, F, K = 6, 10, MAX_INSTANCES
    rng = np.random.RandomState(0)
    windows = rng.rand(N, F, K, 562).astype(np.float32)
    valid = np.ones((N, F, K), bool)
    scores = ev.score_windows(windows, valid)
    assert scores.shape == (N,)
    rows = ev.sweep_thresholds(scores, np.asarray([1, 0, 1, 0, 1, 0.0]))
    assert all("f1" in r for r in rows)
