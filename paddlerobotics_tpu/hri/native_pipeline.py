"""ctypes bridge to the native (C++) serving pipeline.

The reference's Jetson server links the inference engine into the C++
binary (jetson/infer_v3.cpp + libpaddle_fluid). Here the native side
(runtime_cpp/libserving_capi.so) owns the thread pipeline, windows and
business rules, and calls BACK into Python for the two model programs —
which are jitted JAX running on TPU. Frames go down, decisions come up.
"""

from __future__ import annotations

import ctypes
import os
from typing import Callable, Optional

import numpy as np

TOKEN_DIM = 562
MAX_INSTANCES = 20
NUM_FRAMES = 10

_DETECT_FN = ctypes.CFUNCTYPE(
    ctypes.c_int,
    ctypes.POINTER(ctypes.c_float),   # pixels
    ctypes.POINTER(ctypes.c_float),   # boxes out
    ctypes.POINTER(ctypes.c_float),   # scores out
    ctypes.POINTER(ctypes.c_float),   # tokens out
    ctypes.POINTER(ctypes.c_int))     # valid out
_ATTEND_FN = ctypes.CFUNCTYPE(
    None,
    ctypes.POINTER(ctypes.c_float),   # tokens
    ctypes.POINTER(ctypes.c_int),     # valid
    ctypes.POINTER(ctypes.c_float),   # trigger out
    ctypes.POINTER(ctypes.c_float),   # obj scores out
    ctypes.POINTER(ctypes.c_int))     # action id out
_ATTEND_EVAL_FN = ctypes.CFUNCTYPE(
    None,
    ctypes.POINTER(ctypes.c_float),   # tokens
    ctypes.POINTER(ctypes.c_int),     # valid
    ctypes.POINTER(ctypes.c_float),   # trigger out
    ctypes.POINTER(ctypes.c_float),   # obj scores out
    ctypes.POINTER(ctypes.c_int),     # action id out
    ctypes.POINTER(ctypes.c_float))   # act scores out (num_act)


def _make_detect_cb(detect):
    """Wrap a python detect(img (416,416,3)) → (boxes, scores, tokens,
    valid) into the C detect callback (shared by NativePipeline and
    NativeEvalServer)."""

    def _detect_cb(pixels, boxes, scores, tokens, valid):
        img = np.ctypeslib.as_array(pixels, (416, 416, 3)).copy()
        b, s, t, v = detect(img)
        k = min(len(b), MAX_INSTANCES)
        np.ctypeslib.as_array(boxes, (MAX_INSTANCES * 4,))[: k * 4] = \
            np.asarray(b, np.float32)[:k].reshape(-1)
        np.ctypeslib.as_array(scores, (MAX_INSTANCES,))[:k] = \
            np.asarray(s, np.float32)[:k]
        np.ctypeslib.as_array(
            tokens, (MAX_INSTANCES * TOKEN_DIM,))[: k * TOKEN_DIM] = \
            np.asarray(t, np.float32)[:k].reshape(-1)
        np.ctypeslib.as_array(valid, (MAX_INSTANCES,))[:k] = \
            np.asarray(v, np.int32)[:k]
        return k

    return _DETECT_FN(_detect_cb)


def _find_lib() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cand = os.path.join(here, "runtime_cpp", "build", "libserving_capi.so")
    if not os.path.exists(cand):
        raise FileNotFoundError(
            f"{cand} not built — run: cmake -S runtime_cpp -B "
            "runtime_cpp/build -G Ninja && ninja -C runtime_cpp/build")
    return cand


class NativePipeline:
    """Python handle on the C++ GreetingPipeline with JAX callbacks."""

    def __init__(self,
                 detect: Callable[[np.ndarray], tuple],
                 attend: Callable[[np.ndarray, np.ndarray], tuple],
                 trigger_threshold: float = 0.8,
                 near_field_frac: float = 0.1,
                 cooldown_s: float = 5.0,
                 lib_path: Optional[str] = None):
        """detect(pixels (416,416,3)) → (boxes (K,4), scores (K,),
        tokens (K,562), valid (K,)); attend(tokens (F,K,562),
        valid (F,K)) → (trigger, obj_scores (K,), action_id)."""
        self._lib = ctypes.CDLL(lib_path or _find_lib())
        self._lib.pipeline_create.restype = ctypes.c_void_p
        self._lib.pipeline_create.argtypes = [
            ctypes.c_float, ctypes.c_float, ctypes.c_double,
            _DETECT_FN, _ATTEND_FN]
        self._lib.pipeline_submit.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_long, ctypes.c_double]
        self._lib.pipeline_poll.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float)]
        self._lib.pipeline_poll.restype = ctypes.c_int
        self._lib.pipeline_destroy.argtypes = [ctypes.c_void_p]

        def _attend_cb(tokens, valid, trigger, obj, act):
            t = np.ctypeslib.as_array(
                tokens, (NUM_FRAMES, MAX_INSTANCES, TOKEN_DIM)).copy()
            v = np.ctypeslib.as_array(
                valid, (NUM_FRAMES, MAX_INSTANCES)).copy()
            tr, ob, a = attend(t, v)
            trigger[0] = float(tr)
            np.ctypeslib.as_array(obj, (MAX_INSTANCES,))[: len(ob)] = \
                np.asarray(ob, np.float32)
            act[0] = int(a)

        # keep references alive (ctypes does not)
        self._detect_cb = _make_detect_cb(detect)
        self._attend_cb = _ATTEND_FN(_attend_cb)
        self._handle = self._lib.pipeline_create(
            trigger_threshold, near_field_frac, cooldown_s,
            self._detect_cb, self._attend_cb)

    def submit(self, image: np.ndarray, frame_id: int,
               timestamp: float = 0.0):
        img = np.ascontiguousarray(image, np.float32)
        self._lib.pipeline_submit(
            self._handle, img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            frame_id, timestamp)

    def poll(self) -> Optional[dict]:
        trig = ctypes.c_int()
        score = ctypes.c_float()
        act = ctypes.c_int()
        bbox = (ctypes.c_float * 4)()
        if not self._lib.pipeline_poll(self._handle, ctypes.byref(trig),
                                       ctypes.byref(score),
                                       ctypes.byref(act), bbox):
            return None
        return {"triggered": bool(trig.value),
                "trigger_score": score.value,
                "action_id": act.value,
                "target_bbox": list(bbox)}

    def serve(self, port: int = 0) -> int:
        """Expose this pipeline over the native streaming transport
        (runtime_cpp/stream_server.cpp; the socket stand-in for the
        reference's gRPC ProactiveGreeting service). Returns the bound
        port (ephemeral when port=0). Clients: hri.stream_client."""
        self._lib.server_create.restype = ctypes.c_void_p
        self._lib.server_create.argtypes = [ctypes.c_void_p,
                                            ctypes.c_ushort]
        self._lib.server_port.argtypes = [ctypes.c_void_p]
        self._lib.server_port.restype = ctypes.c_int
        self._lib.server_destroy.argtypes = [ctypes.c_void_p]
        self._server = self._lib.server_create(self._handle, port)
        return int(self._lib.server_port(self._server))

    def close(self):
        if getattr(self, "_server", None):
            self._lib.server_destroy(self._server)
            self._server = None
        if self._handle:
            self._lib.pipeline_destroy(self._handle)
            self._handle = None


class NativeEvalServer:
    """Python handle on the C++ offline EvalServer
    (runtime_cpp/eval_server.cpp — the eval_server.proto equivalent,
    jetson/eval_v3.cpp:1215-1310). Scores whole frame windows per
    request; the model programs are JAX callbacks on TPU, the window
    assembly + decision rule + transport are native. Client:
    hri.stream_client.EvalStreamClient."""

    def __init__(self,
                 detect: Callable[[np.ndarray], tuple],
                 attend: Callable[[np.ndarray, np.ndarray], tuple],
                 num_act: int,
                 trigger_threshold: float = 0.8,
                 near_field_frac: float = 0.1,
                 port: int = 0,
                 lib_path: Optional[str] = None):
        """detect as NativePipeline; attend(tokens (F,K,562),
        valid (F,K)) → (trigger, obj_scores (K,), action_id,
        act_scores (num_act,))."""
        self._lib = ctypes.CDLL(lib_path or _find_lib())
        self._lib.eval_server_create.restype = ctypes.c_void_p
        self._lib.eval_server_create.argtypes = [
            _DETECT_FN, _ATTEND_EVAL_FN, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_ushort]
        self._lib.eval_server_port.argtypes = [ctypes.c_void_p]
        self._lib.eval_server_port.restype = ctypes.c_int
        self._lib.eval_server_destroy.argtypes = [ctypes.c_void_p]

        def _attend_cb(tokens, valid, trigger, obj, act, act_scores):
            t = np.ctypeslib.as_array(
                tokens, (NUM_FRAMES, MAX_INSTANCES, TOKEN_DIM)).copy()
            v = np.ctypeslib.as_array(
                valid, (NUM_FRAMES, MAX_INSTANCES)).copy()
            tr, ob, a, acts = attend(t, v)
            trigger[0] = float(tr)
            np.ctypeslib.as_array(obj, (MAX_INSTANCES,))[: len(ob)] = \
                np.asarray(ob, np.float32)
            act[0] = int(a)
            acts = np.asarray(acts, np.float32)[:num_act]
            np.ctypeslib.as_array(
                act_scores, (num_act,))[: acts.size] = acts

        self._detect_cb = _make_detect_cb(detect)
        self._attend_cb = _ATTEND_EVAL_FN(_attend_cb)
        self._handle = self._lib.eval_server_create(
            self._detect_cb, self._attend_cb, num_act,
            trigger_threshold, near_field_frac, port)
        self.port = int(self._lib.eval_server_port(self._handle))

    def close(self):
        if self._handle:
            self._lib.eval_server_destroy(self._handle)
            self._handle = None


_CLIP_SCORE_FN = ctypes.CFUNCTYPE(
    None, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ctypes.POINTER(ctypes.c_int))

CLIP_LEN = 8     # OB_WINDOW_LEN, jetson/eval_r2plus1d.cpp:47
CLIP_RES = 224   # IMG_RESIZE, eval_r2plus1d.cpp:43


class NativeClipEvalServer:
    """Python handle on the C++ EvalServer's R(2+1)D variant
    (runtime_cpp/eval_server.cpp ScoreClip — the native counterpart of
    jetson/eval_r2plus1d.cpp's EvalServiceImpl/infer). The clip
    preprocessing (416-letterbox → 224 CHW Kinetics-normalized),
    windowing, null-action rule and transport are native; the scoring
    callback is the JAX R(2+1)D program (hri/r2plus1d.py). Client:
    hri.stream_client.EvalStreamClient (same wire format)."""

    def __init__(self,
                 score: "Callable[[np.ndarray], tuple]",
                 num_act: int,
                 port: int = 0,
                 lib_path: Optional[str] = None):
        """score(clip (CLIP_LEN,3,224,224) float32) →
        (act_scores (num_act,), sampled_id)."""
        self._lib = ctypes.CDLL(lib_path or _find_lib())
        self._lib.eval_server_create_r2p1d.restype = ctypes.c_void_p
        self._lib.eval_server_create_r2p1d.argtypes = [
            _CLIP_SCORE_FN, ctypes.c_int, ctypes.c_ushort]
        self._lib.eval_server_port.argtypes = [ctypes.c_void_p]
        self._lib.eval_server_port.restype = ctypes.c_int
        self._lib.eval_server_destroy.argtypes = [ctypes.c_void_p]

        def _score_cb(clip, act_scores, sampled_id):
            c = np.ctypeslib.as_array(
                clip, (CLIP_LEN, 3, CLIP_RES, CLIP_RES)).copy()
            acts, sid = score(c)
            acts = np.asarray(acts, np.float32)[:num_act]
            np.ctypeslib.as_array(
                act_scores, (num_act,))[: acts.size] = acts
            sampled_id[0] = int(sid)

        self._score_cb = _CLIP_SCORE_FN(_score_cb)
        self._handle = self._lib.eval_server_create_r2p1d(
            self._score_cb, num_act, port)
        self.port = int(self._lib.eval_server_port(self._handle))

    def close(self):
        if self._handle:
            self._lib.eval_server_destroy(self._handle)
            self._handle = None


class NativeGrpcServer:
    """Python handle on the C++ native gRPC front
    (runtime_cpp/grpc_server.cpp): a from-scratch HTTP/2 + HPACK server
    speaking the REAL gRPC wire protocol for both reference methods —
    `/grpc.ProactiveGreeting/infer` (bidi stream, lock-step like
    infer_v3.cpp:1589-1640, backed by the native GreetingPipeline) and
    `/evalserver.EvalServer/infer` (unary window scoring) — on one
    port. Interoperable with grpcio clients
    (hri.grpc_transport.GreetingGrpcClient / EvalGrpcClient);
    tests/test_native_pipeline.py pins the interop."""

    def __init__(self,
                 detect: Callable[[np.ndarray], tuple],
                 attend: Callable[[np.ndarray, np.ndarray], tuple],
                 num_act: int,
                 trigger_threshold: float = 0.8,
                 near_field_frac: float = 0.1,
                 cooldown_s: float = 0.0,
                 port: int = 0,
                 lib_path: Optional[str] = None):
        """Callbacks exactly as NativeEvalServer (detect per frame,
        attend(tokens (F,K,562), valid (F,K)) → (trigger, obj_scores,
        action_id, act_scores))."""
        self._lib = ctypes.CDLL(lib_path or _find_lib())
        self._lib.grpc_server_create.restype = ctypes.c_void_p
        self._lib.grpc_server_create.argtypes = [
            _DETECT_FN, _ATTEND_EVAL_FN, ctypes.c_int, ctypes.c_float,
            ctypes.c_float, ctypes.c_double, ctypes.c_ushort]
        self._lib.grpc_server_port.argtypes = [ctypes.c_void_p]
        self._lib.grpc_server_port.restype = ctypes.c_int
        self._lib.grpc_server_destroy.argtypes = [ctypes.c_void_p]

        def _attend_cb(tokens, valid, trigger, obj, act, act_scores):
            t = np.ctypeslib.as_array(
                tokens, (NUM_FRAMES, MAX_INSTANCES, TOKEN_DIM)).copy()
            v = np.ctypeslib.as_array(
                valid, (NUM_FRAMES, MAX_INSTANCES)).copy()
            tr, ob, a, acts = attend(t, v)
            trigger[0] = float(tr)
            np.ctypeslib.as_array(obj, (MAX_INSTANCES,))[: len(ob)] = \
                np.asarray(ob, np.float32)
            act[0] = int(a)
            acts = np.asarray(acts, np.float32)[:num_act]
            np.ctypeslib.as_array(
                act_scores, (num_act,))[: acts.size] = acts

        self._detect_cb = _make_detect_cb(detect)
        self._attend_cb = _ATTEND_EVAL_FN(_attend_cb)
        self._handle = self._lib.grpc_server_create(
            self._detect_cb, self._attend_cb, num_act,
            trigger_threshold, near_field_frac, cooldown_s, port)
        self.port = int(self._lib.grpc_server_port(self._handle))

    def close(self):
        if self._handle:
            self._lib.grpc_server_destroy(self._handle)
            self._handle = None
