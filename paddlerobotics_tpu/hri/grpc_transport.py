"""Real gRPC transport for the greeting/eval services.

The reference serves ProactiveGreeting.infer (bidi stream) and
EvalServer.infer (unary) over gRPC C++ (jetson/infer_v3.cpp:1583-1690,
eval_v3.cpp:1196-1320). This image has no gRPC C++ runtime — the native
`runtime_cpp/` servers use a documented length-prefixed TCP framing —
but grpcio IS available in Python, so this module speaks the ACTUAL
gRPC protocol (HTTP/2 + proto3 wire bytes via `pg_proto`) with the
reference's exact method paths, interoperable with the reference's C++
and Java clients.

No codegen: `grpc.method_handlers_generic_handler` /
`channel.stream_stream` take the serializer/deserializer callables
directly, so the hand-written codec in `pg_proto` plugs straight in.

Frame payloads (auto-detected by byte length, per request):
  - reference-exact: raw uint8 BGR `(view_h, view_w, 3)` frames
    (infer_v3.cpp DecodeImage:1577-1581; eval frames stacked on height,
    eval_v3.cpp DecodeFrames:1183-1194; VIEW = 360x640) — letterboxed
    to the 416 detector input here, RGB-flipped;
  - native-stack: float32 RGB letterboxed `(416,416,3)` in [0,1] (what
    `runtime_cpp/stream_server.cpp` and `hri/serving.py` consume).
"""

from __future__ import annotations

import json
from concurrent import futures
from typing import Callable, Iterator, Optional, Sequence, Tuple

import numpy as np

from paddlerobotics_tpu.hri import pg_proto as pb
from paddlerobotics_tpu.hri.utils import letterbox_image

try:                       # grpcio ships in the image; keep importable
    import grpc            # without it for minimal installs
except ImportError:        # pragma: no cover
    grpc = None

VIEW_HW = (360, 640)       # infer_v3.cpp:46-47 (720/2, 1280/2)
TARGET = 416
# float32 letterboxed clips exceed gRPC's 4 MB default message cap
# (one 416x416x3 f32 frame is ~2 MB); match the reference's raw-frame
# streaming headroom.
_MSG_OPTIONS = [("grpc.max_receive_message_length", 256 * 1024 * 1024),
                ("grpc.max_send_message_length", 256 * 1024 * 1024)]


def _require_grpc():
    if grpc is None:
        raise RuntimeError("grpcio is not installed; use the native TCP "
                           "transport (hri/stream_client.py) instead")


def decode_frame(blob: bytes, view_hw: Tuple[int, int] = VIEW_HW,
                 target: int = TARGET) -> np.ndarray:
    """curFrame bytes -> float32 RGB (target,target,3) in [0,1]."""
    h, w = view_hw
    if len(blob) == target * target * 3 * 4:
        return np.frombuffer(blob, np.float32).reshape(target, target, 3)
    if len(blob) == h * w * 3:
        bgr = np.frombuffer(blob, np.uint8).reshape(h, w, 3)
        rgb = bgr[..., ::-1].astype(np.float32) / 255.0
        return letterbox_image(rgb, target)
    raise ValueError(
        f"curFrame is {len(blob)} bytes; expected float32 letterboxed "
        f"({target}x{target}x3) or uint8 view ({h}x{w}x3)")


def decode_eval_frames(req: pb.EvalRequest,
                       view_hw: Tuple[int, int] = VIEW_HW,
                       target: int = TARGET) -> list[np.ndarray]:
    """EvalRequest -> list of nframe float32 RGB (target,target,3)."""
    n = req.nframe
    if n <= 0:
        return []
    h, w = view_hw
    if len(req.frames) == n * h * w * 3:           # stacked uint8 view
        merge = np.frombuffer(req.frames, np.uint8).reshape(n, h, w, 3)
        return [letterbox_image(f[..., ::-1].astype(np.float32) / 255.0,
                                target) for f in merge]
    if len(req.frames) == n * target * target * 3 * 4:
        arr = np.frombuffer(req.frames, np.float32)
        return list(arr.reshape(n, target, target, 3))
    raise ValueError(f"frames is {len(req.frames)} bytes for nframe={n}")


class GreetingGrpcServer:
    """ProactiveGreeting.infer bidi-stream server.

    `process_frame(image, lag_ms, wakeup) -> dict` is the decision
    backend — e.g. a closure over
    `hri.serving.ProactiveGreetingService.process_frame` or the native
    pipeline bridge. One response is written per request, like the
    reference's lock-step Read/Write loop (infer_v3.cpp:1589-1640).
    """

    def __init__(self, process_frame: Callable[[np.ndarray, int, str],
                                               dict],
                 port: int = 0, view_hw: Tuple[int, int] = VIEW_HW,
                 max_workers: int = 4):
        _require_grpc()
        self._fn = process_frame
        self._view_hw = view_hw

        def infer(request_iterator, context):
            for req in request_iterator:
                try:
                    img = decode_frame(req.cur_frame, self._view_hw)
                    decision = self._fn(img, req.lag, req.wakeup)
                except ValueError as e:
                    decision = {"triggered": False, "error": str(e)}
                decision.setdefault("req_id", req.req_id)
                yield pb.InferResponse(response=json.dumps(decision))

        service, method = pb.GREETING_INFER.strip("/").split("/")
        handler = grpc.method_handlers_generic_handler(service, {
            method: grpc.stream_stream_rpc_method_handler(
                infer,
                request_deserializer=pb.VideoRequest.decode,
                response_serializer=pb.InferResponse.encode)})
        self._server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=max_workers),
            handlers=(handler,), options=_MSG_OPTIONS)
        self.port = self._server.add_insecure_port(f"127.0.0.1:{port}")

    def start(self):
        self._server.start()
        return self

    def stop(self, grace: Optional[float] = 1.0):
        self._server.stop(grace)


class EvalGrpcServer:
    """EvalServer.infer unary server.

    `score_clip(frames) -> dict` gets the decoded frame list and must
    return the EvalResponse fields (`response` may be any JSON-able
    value); mirrors eval_v3.cpp:1215-1320 / the native
    runtime_cpp/eval_server.cpp contract.
    """

    def __init__(self, score_clip: Callable[[Sequence[np.ndarray]], dict],
                 port: int = 0, view_hw: Tuple[int, int] = VIEW_HW,
                 max_workers: int = 4):
        _require_grpc()

        def infer(req, context):
            frames = decode_eval_frames(req, view_hw)
            out = score_clip(frames)
            resp = out.get("response", "")
            return pb.EvalResponse(
                response=resp if isinstance(resp, str) else
                json.dumps(resp),
                response_score=float(out.get("response_score", 0.0)),
                trigger_pred=float(out.get("trigger_pred", 0.0)),
                nullact_score=float(out.get("nullact_score", 0.0)),
                nullact_id=int(out.get("nullact_id", 0)))

        service, method = pb.EVAL_INFER.strip("/").split("/")
        handler = grpc.method_handlers_generic_handler(service, {
            method: grpc.unary_unary_rpc_method_handler(
                infer,
                request_deserializer=pb.EvalRequest.decode,
                response_serializer=pb.EvalResponse.encode)})
        self._server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=max_workers),
            handlers=(handler,), options=_MSG_OPTIONS)
        self.port = self._server.add_insecure_port(f"127.0.0.1:{port}")

    def start(self):
        self._server.start()
        return self

    def stop(self, grace: Optional[float] = 1.0):
        self._server.stop(grace)


class GreetingGrpcClient:
    """Robot-side client of ProactiveGreeting.infer (the role the
    reference's Java robokit client plays)."""

    def __init__(self, target: str, timeout: Optional[float] = None):
        _require_grpc()
        self._channel = grpc.insecure_channel(target, options=_MSG_OPTIONS)
        self._infer = self._channel.stream_stream(
            pb.GREETING_INFER,
            request_serializer=pb.VideoRequest.encode,
            response_deserializer=pb.InferResponse.decode)
        self._timeout = timeout

    def infer(self, requests: Iterator[pb.VideoRequest]) -> Iterator[dict]:
        """Bidi stream: yields one parsed JSON decision per request."""
        for resp in self._infer(requests, timeout=self._timeout):
            yield json.loads(resp.response)

    @staticmethod
    def video_request(req_id: int, frame: np.ndarray, lag_ms: int = 0,
                      wakeup: str = "") -> pb.VideoRequest:
        """frame: uint8 BGR view image OR float32 RGB letterboxed."""
        arr = np.ascontiguousarray(frame)
        return pb.VideoRequest(req_id=req_id, lag=lag_ms, wakeup=wakeup,
                               cur_frame=arr.tobytes())

    def close(self):
        self._channel.close()


class EvalGrpcClient:
    """Offline eval client (jetson/parallel_eval.py's stub role)."""

    def __init__(self, target: str, timeout: Optional[float] = 30.0):
        _require_grpc()
        self._channel = grpc.insecure_channel(target, options=_MSG_OPTIONS)
        self._infer = self._channel.unary_unary(
            pb.EVAL_INFER,
            request_serializer=pb.EvalRequest.encode,
            response_deserializer=pb.EvalResponse.decode)
        self._timeout = timeout

    def infer(self, frames: Sequence[np.ndarray]) -> dict:
        blob = b"".join(np.ascontiguousarray(f).tobytes() for f in frames)
        resp = self._infer(pb.EvalRequest(nframe=len(frames), frames=blob),
                           timeout=self._timeout)
        try:
            response = json.loads(resp.response) if resp.response else ""
        except json.JSONDecodeError:
            response = resp.response
        return {"response": response,
                "response_score": resp.response_score,
                "trigger_pred": resp.trigger_pred,
                "nullact_score": resp.nullact_score,
                "nullact_id": resp.nullact_id}

    def close(self):
        self._channel.close()
