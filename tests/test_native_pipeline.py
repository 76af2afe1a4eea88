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


def test_stream_transport_full_loop():
    """Python model callbacks → C++ pipeline → native streaming server →
    Python client: the complete serving loop across the language
    boundary (the socket stand-in for ProactiveGreeting.infer)."""
    from paddlerobotics_tpu.hri.native_pipeline import NativePipeline
    from paddlerobotics_tpu.hri.stream_client import GreetingStreamClient

    def detect(img):
        boxes = np.array([[100, 20, 200, 380]], np.float32)
        return (boxes, np.array([0.9], np.float32),
                np.ones((1, 562), np.float32), np.array([1], np.int32))

    def attend(tokens, valid):
        return 0.95, np.array([0.8], np.float32), 2

    pipe = NativePipeline(detect, attend, trigger_threshold=0.8,
                          near_field_frac=0.1, cooldown_s=0.0)
    client = None
    try:
        port = pipe.serve(0)
        assert port > 0
        client = GreetingStreamClient(port=port)
        img = np.zeros((416, 416, 3), np.float32)
        for i in range(12):
            client.send_frame(i, img, lag_ms=20,
                              wakeup="hi" if i == 0 else "")
            time.sleep(0.01)
        resp = client.read_response()
        assert "triggered" in resp
        # decisions echo the frame the window ended on (serving_bench
        # matches pipelined responses back to frames through this)
        assert 9 <= resp["frame_id"] < 12
        # the stub always fires above threshold → some response in the
        # stream is a trigger
        for _ in range(20):
            if resp.get("triggered"):
                break
            resp = client.read_response()
        assert resp["triggered"] is True
        assert resp["action_id"] == 2
    finally:
        if client is not None:
            client.close()
        pipe.close()


def test_eval_server_full_loop():
    """Python model callbacks → C++ EvalServer → EvalStreamClient:
    unary batch-of-frames scoring (the eval_server.proto equivalent,
    jetson/eval_v3.cpp:1215-1310)."""
    from paddlerobotics_tpu.hri.native_pipeline import NativeEvalServer
    from paddlerobotics_tpu.hri.stream_client import EvalStreamClient

    calls = {"detect": 0, "attend": 0}

    def detect(img):
        calls["detect"] += 1
        boxes = np.array([[100, 20, 200, 380]], np.float32)
        return (boxes, np.array([0.9], np.float32),
                np.full((1, 562), float(img[0, 0, 0]), np.float32),
                np.array([1], np.int32))

    def attend(tokens, valid):
        calls["attend"] += 1
        # trigger = mean token value over valid slots
        m = float(tokens[valid > 0].mean()) if (valid > 0).any() else 0.0
        acts = np.array([0.05, 0.15, 0.6, 0.2], np.float32)
        return m, np.array([0.8], np.float32), 2, acts

    server = NativeEvalServer(detect, attend, num_act=4,
                              trigger_threshold=0.8)
    client = None
    try:
        assert server.port > 0
        client = EvalStreamClient(port=server.port)

        hi = np.full((416, 416, 3), 0.95, np.float32)
        out = client.infer([hi] * 10)
        assert calls["detect"] == 10 and calls["attend"] == 1
        assert out["trigger_pred"] == pytest.approx(0.95, abs=1e-5)
        assert out["response"]["triggered"] is True
        assert out["response"]["action_id"] == 2
        assert out["nullact_id"] == 2          # argmax of act scores
        assert out["nullact_score"] == pytest.approx(0.05, abs=1e-6)
        assert out["response_score"] == pytest.approx(0.6, abs=1e-6)

        lo = np.full((416, 416, 3), 0.1, np.float32)
        out2 = client.infer([lo] * 10)
        assert out2["response"]["triggered"] is False
        assert out2["response"]["reason"] == "below_threshold"

        # short window: left-padded, only 3 detects
        calls["detect"] = 0
        out3 = client.infer([hi] * 3)
        assert calls["detect"] == 3
        assert out3["trigger_pred"] == pytest.approx(0.95, abs=1e-5)
    finally:
        if client is not None:
            client.close()
        server.close()


def test_clip_eval_server_r2plus1d_loop():
    """JAX R(2+1)D scoring callback → C++ clip EvalServer (the
    eval_r2plus1d.cpp equivalent) → EvalStreamClient. The C++ side
    letterbox-resizes 416→224, Kinetics-normalizes, windows to 8
    frames; the callback runs a (tiny) real R2Plus1D18 program."""
    import jax
    import jax.numpy as jnp

    from paddlerobotics_tpu.hri.native_pipeline import (CLIP_LEN, CLIP_RES,
                                                        NativeClipEvalServer)
    from paddlerobotics_tpu.hri.r2plus1d import R2Plus1D18
    from paddlerobotics_tpu.hri.stream_client import EvalStreamClient

    num_act = 6
    model = R2Plus1D18(num_classes=num_act, blocks=((8, (1, 2, 2)),),
                       stem_kernel=3)
    x0 = jnp.zeros((1, CLIP_LEN, CLIP_RES, CLIP_RES, 3))
    params = model.init(jax.random.key(0), x0)

    @jax.jit
    def fwd(clip):
        # C++ sends (T,3,H,W) CHW; the model takes (B,T,H,W,3)
        x = jnp.transpose(clip, (0, 2, 3, 1))[None]
        logits = model.apply(params, x)
        return jax.nn.softmax(logits[0])

    seen = {}

    def score(clip):
        seen["shape"] = clip.shape
        probs = np.asarray(fwd(jnp.asarray(clip)))
        # top-k sample stand-in: the argmax (deterministic)
        return probs, int(np.argmax(probs))

    server = NativeClipEvalServer(score, num_act=num_act)
    client = None
    try:
        assert server.port > 0
        client = EvalStreamClient(port=server.port)
        frames = [np.full((416, 416, 3), 0.5, np.float32)
                  for _ in range(10)]
        out = client.infer(frames)
        assert seen["shape"] == (CLIP_LEN, 3, CLIP_RES, CLIP_RES)
        assert 0 <= out["nullact_id"] < num_act
        assert np.isfinite(out["nullact_score"])
        # response JSON: either the null-act "{}" or a triggered action
        assert isinstance(out["response"], dict)
        if out["nullact_id"] != 0:
            assert out["response"].get("triggered") is True
    finally:
        if client is not None:
            client.close()
        server.close()


def test_native_grpc_server_interop_with_grpcio():
    """grpcio client ↔ the from-scratch C++ gRPC/HTTP/2 server
    (runtime_cpp/grpc_server.cpp): REAL wire protocol on both reference
    methods — the greeting bidi stream and the unary eval — proving the
    native front speaks what grpc C-core/grpcio emit (HPACK incl.
    Huffman, flow control, trailers)."""
    pytest.importorskip("grpc")
    from paddlerobotics_tpu.hri.grpc_transport import (EvalGrpcClient,
                                                       GreetingGrpcClient)
    from paddlerobotics_tpu.hri.native_pipeline import NativeGrpcServer

    def detect(img):
        boxes = np.array([[100, 20, 200, 380]], np.float32)
        return (boxes, np.array([0.9], np.float32),
                np.full((1, 562), float(img[0, 0, 0]), np.float32),
                np.array([1], np.int32))

    def attend(tokens, valid):
        m = float(tokens[valid > 0].mean()) if (valid > 0).any() else 0.0
        acts = np.array([0.05, 0.15, 0.6, 0.2], np.float32)
        return m, np.array([0.8], np.float32), 2, acts

    server = NativeGrpcServer(detect, attend, num_act=4,
                              trigger_threshold=0.5)
    greet_client = eval_client = None
    try:
        assert server.port > 0
        # --- bidi greeting stream (lock-step, infer_v3.cpp:1589-1640)
        greet_client = GreetingGrpcClient(f"127.0.0.1:{server.port}",
                                          timeout=60)
        hi = np.full((416, 416, 3), 0.9, np.float32)
        reqs = [greet_client.video_request(i, hi, lag_ms=12)
                for i in range(12)]
        outs = list(greet_client.infer(iter(reqs)))
        assert len(outs) == 12
        # the pipeline attends once 10 frames are windowed
        # (infer_v3.cpp OB_WINDOW_LEN); earlier responses report the
        # bounded lock-step wait elapsing with no decision ready
        assert outs[0]["reason"] == "pending"
        assert outs[9]["triggered"] is True
        assert outs[9]["trigger_score"] == pytest.approx(0.9, abs=1e-4)
        assert outs[9]["action_id"] == 2
        # --- unary eval on the SAME port (eval_server.proto)
        eval_client = EvalGrpcClient(f"127.0.0.1:{server.port}",
                                     timeout=60)
        out = eval_client.infer([hi] * 4)
        assert out["trigger_pred"] == pytest.approx(0.9, abs=1e-4)
        assert out["nullact_id"] == 2
        assert out["response"]["triggered"] is True
    finally:
        if greet_client is not None:
            greet_client.close()
        if eval_client is not None:
            eval_client.close()
        server.close()
