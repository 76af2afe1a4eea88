"""Real-gRPC transport tests: the hand-written proto3 codec is
cross-validated against google.protobuf dynamic messages built from the
reference's .proto field specs (jetson/proactive_greeting.proto,
jetson/eval_server.proto), then both services run loopback over real
grpcio channels."""

import json

import numpy as np
import pytest

from paddlerobotics_tpu.hri import pg_proto as pb

grpc = pytest.importorskip("grpc")

from paddlerobotics_tpu.hri.grpc_transport import (  # noqa: E402
    VIEW_HW, EvalGrpcClient, EvalGrpcServer, GreetingGrpcClient,
    GreetingGrpcServer, decode_eval_frames, decode_frame)

# ---------------------------------------------------------------- codec


def _dynamic_classes():
    """Build reference-spec message classes with google.protobuf."""
    from google.protobuf import (descriptor_pb2, descriptor_pool,
                                 message_factory)
    F = descriptor_pb2.FieldDescriptorProto
    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "pg_test.proto"
    fdp.package = "pgtest"
    fdp.syntax = "proto3"

    def add(name, *fields_):
        m = fdp.message_type.add()
        m.name = name
        for num, fname, ftype in fields_:
            f = m.field.add()
            f.name, f.number, f.type = fname, num, ftype
            f.label = F.LABEL_OPTIONAL

    add("VideoRequest", (1, "reqID", F.TYPE_INT32),
        (2, "lag", F.TYPE_INT32), (3, "wakeup", F.TYPE_STRING),
        (4, "curFrame", F.TYPE_BYTES))
    add("InferResponse", (1, "response", F.TYPE_STRING))
    add("EvalRequest", (1, "nframe", F.TYPE_INT32),
        (2, "frames", F.TYPE_BYTES))
    add("EvalResponse", (1, "response", F.TYPE_STRING),
        (2, "response_score", F.TYPE_FLOAT),
        (3, "trigger_pred", F.TYPE_FLOAT),
        (4, "nullact_score", F.TYPE_FLOAT),
        (5, "nullact_id", F.TYPE_INT32))
    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    get = message_factory.GetMessageClass
    return {n: get(pool.FindMessageTypeByName(f"pgtest.{n}"))
            for n in ("VideoRequest", "InferResponse", "EvalRequest",
                      "EvalResponse")}


CASES = [
    (pb.VideoRequest(req_id=7, lag=120, wakeup="1",
                     cur_frame=b"\x00\x01\xff" * 5),
     "VideoRequest", dict(reqID=7, lag=120, wakeup="1",
                          curFrame=b"\x00\x01\xff" * 5)),
    (pb.VideoRequest(req_id=-3),                 # negative int32
     "VideoRequest", dict(reqID=-3)),
    (pb.VideoRequest(),                          # all defaults -> b""
     "VideoRequest", dict()),
    (pb.InferResponse(response='{"triggered":false}'),
     "InferResponse", dict(response='{"triggered":false}')),
    (pb.EvalRequest(nframe=8, frames=b"z" * 64),
     "EvalRequest", dict(nframe=8, frames=b"z" * 64)),
    (pb.EvalResponse(response="hi", response_score=0.5,
                     trigger_pred=-1.25, nullact_score=0.0009765625,
                     nullact_id=2147483647),
     "EvalResponse", dict(response="hi", response_score=0.5,
                          trigger_pred=-1.25,
                          nullact_score=0.0009765625,
                          nullact_id=2147483647)),
]


def test_codec_roundtrip():
    for msg, _, _ in CASES:
        assert type(msg).decode(msg.encode()) == msg


def test_codec_matches_google_protobuf():
    classes = _dynamic_classes()
    for msg, name, kw in CASES:
        ref = classes[name](**kw)
        # ours -> protobuf parses identically
        parsed = classes[name].FromString(msg.encode())
        assert parsed == ref, f"{name}: protobuf rejects our bytes"
        # protobuf -> ours parses identically
        assert type(msg).decode(ref.SerializeToString()) == msg


def test_codec_skips_unknown_fields():
    # append an unknown field 9 (varint) and 10 (len-delimited)
    extra = bytes([9 << 3 | 0, 42, 10 << 3 | 2, 3]) + b"abc"
    msg = pb.EvalRequest(nframe=2, frames=b"xy")
    assert pb.EvalRequest.decode(msg.encode() + extra) == msg


def test_codec_rejects_truncation():
    buf = pb.VideoRequest(wakeup="hello").encode()
    with pytest.raises(ValueError):
        pb.VideoRequest.decode(buf[:-2])


# -------------------------------------------------------------- frames


def test_decode_frame_both_formats():
    h, w = VIEW_HW
    u8 = (np.arange(h * w * 3) % 255).astype(np.uint8).reshape(h, w, 3)
    out = decode_frame(u8.tobytes())
    assert out.shape == (416, 416, 3) and out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0

    f32 = np.random.default_rng(0).random((416, 416, 3), np.float32)
    np.testing.assert_array_equal(decode_frame(f32.tobytes()), f32)

    with pytest.raises(ValueError):
        decode_frame(b"\x00" * 17)


def test_decode_eval_frames_stacked_uint8():
    h, w = VIEW_HW
    n = 3
    stack = np.random.default_rng(1).integers(
        0, 255, (n, h, w, 3), dtype=np.uint8)
    req = pb.EvalRequest(nframe=n, frames=stack.tobytes())
    frames = decode_eval_frames(req)
    assert len(frames) == n
    assert all(f.shape == (416, 416, 3) for f in frames)
    # per-frame content must line up with the height-stacked layout
    one = decode_frame(stack[1].tobytes())
    np.testing.assert_array_equal(frames[1], one)


# ---------------------------------------------------------- greeting rpc


def test_greeting_bidi_stream_loopback():
    seen = []

    def process(img, lag, wakeup):
        seen.append((img.shape, lag, wakeup))
        return {"triggered": lag == 0, "trigger_score": 0.9}

    server = GreetingGrpcServer(process).start()
    try:
        client = GreetingGrpcClient(f"127.0.0.1:{server.port}")
        h, w = VIEW_HW
        u8 = np.zeros((h, w, 3), np.uint8)
        f32 = np.full((416, 416, 3), 0.5, np.float32)
        reqs = [client.video_request(1, u8, lag_ms=0, wakeup="1"),
                client.video_request(2, f32, lag_ms=700)]
        outs = list(client.infer(iter(reqs)))
        client.close()
    finally:
        server.stop(0)

    assert [o["req_id"] for o in outs] == [1, 2]
    assert outs[0]["triggered"] and not outs[1]["triggered"]
    assert seen == [((416, 416, 3), 0, "1"), ((416, 416, 3), 700, "")]


def test_greeting_bad_frame_is_reported_not_fatal():
    server = GreetingGrpcServer(lambda i, l, w: {"triggered": True}).start()
    try:
        client = GreetingGrpcClient(f"127.0.0.1:{server.port}")
        bad = pb.VideoRequest(req_id=5, cur_frame=b"nope")
        out = next(iter(client.infer(iter([bad]))))
        client.close()
    finally:
        server.stop(0)
    assert out["req_id"] == 5 and not out["triggered"] and "error" in out


# -------------------------------------------------------------- eval rpc


def test_eval_unary_loopback():
    def score(frames):
        return {"response": {"act": "wave", "n": len(frames)},
                "response_score": 0.75, "trigger_pred": 0.9,
                "nullact_score": 0.1, "nullact_id": 3}

    server = EvalGrpcServer(score).start()
    try:
        client = EvalGrpcClient(f"127.0.0.1:{server.port}")
        frames = [np.full((416, 416, 3), 0.25, np.float32)
                  for _ in range(4)]
        out = client.infer(frames)
        client.close()
    finally:
        server.stop(0)

    assert out["response"] == {"act": "wave", "n": 4}
    assert abs(out["response_score"] - 0.75) < 1e-6
    assert out["nullact_id"] == 3


def test_eval_wire_bytes_are_reference_protobuf():
    """A raw grpc call with google.protobuf (de)serializers against our
    server — proving a reference-style generated-stub client would
    interoperate byte-for-byte."""
    classes = _dynamic_classes()
    EvalReq, EvalResp = classes["EvalRequest"], classes["EvalResponse"]

    server = EvalGrpcServer(
        lambda fr: {"response": json.dumps({"n": len(fr)}),
                    "trigger_pred": 0.5, "nullact_id": 1}).start()
    try:
        channel = grpc.insecure_channel(f"127.0.0.1:{server.port}")
        stub = channel.unary_unary(
            pb.EVAL_INFER,
            request_serializer=EvalReq.SerializeToString,
            response_deserializer=EvalResp.FromString)
        f32 = np.full((2, 416, 416, 3), 0.5, np.float32)
        resp = stub(EvalReq(nframe=2, frames=f32.tobytes()), timeout=10)
        channel.close()
    finally:
        server.stop(0)

    assert json.loads(resp.response) == {"n": 2}
    assert abs(resp.trigger_pred - 0.5) < 1e-6 and resp.nullact_id == 1
