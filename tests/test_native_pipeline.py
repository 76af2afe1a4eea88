"""End-to-end test of the C++ pipeline driven through Python callbacks."""

import os
import time

import numpy as np
import pytest

LIB = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "runtime_cpp", "build", "libserving_capi.so")

pytestmark = pytest.mark.skipif(not os.path.exists(LIB),
                                reason="native lib not built")


def test_native_pipeline_roundtrip():
    from paddlerobotics_tpu.hri.native_pipeline import NativePipeline

    calls = {"detect": 0, "attend": 0}

    def detect(img):
        calls["detect"] += 1
        boxes = np.array([[100, 50, 200, 350]], np.float32)
        scores = np.array([0.9], np.float32)
        tokens = np.ones((1, 562), np.float32)
        valid = np.array([1], np.int32)
        return boxes, scores, tokens, valid

    def attend(tokens, valid):
        calls["attend"] += 1
        return 0.95, np.array([0.8], np.float32), 4

    pipe = NativePipeline(detect, attend, trigger_threshold=0.8,
                          near_field_frac=0.1, cooldown_s=0.0)
    try:
        img = np.zeros((416, 416, 3), np.float32)
        for i in range(15):
            pipe.submit(img, i, timestamp=time.time())
            time.sleep(0.01)
        deadline = time.time() + 3.0
        decision = None
        while time.time() < deadline:
            d = pipe.poll()
            if d and d["triggered"]:
                decision = d
                break
            time.sleep(0.02)
        assert decision is not None, calls
        assert decision["action_id"] == 4
        assert calls["detect"] >= 10
        assert calls["attend"] >= 1
    finally:
        pipe.close()
