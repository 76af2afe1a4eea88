"""Darknet cfg interpreter + .weights importer (flax).

Offline-compatible replacement for the reference's weight-conversion
toolchain (HRI/TFVT_HRI/tools/darknet_to_keras.py:287 →
keras_to_tensorflow.py → x2paddle): instead of converting darknet
weights through three frameworks, we *interpret the .cfg directly* as a
flax module — every [convolutional]/[route]/[shortcut]/[maxpool]/
[upsample]/[yolo] section becomes the corresponding op in declaration
order — and stream the .weights file into the parameter tree in the
exact order darknet serializes it (per conv: bn_bias, bn_scale,
bn_mean, bn_var, then OIHW kernels; bias+kernels when batch_normalize
is absent). Because the network is built FROM the cfg, the weight↔layer
correspondence is correct by construction; no name-matching heuristics.

The reference ships `tools/yolov4.cfg`; the importer's section-by-
section accounting over that real cfg reproduces the published
yolov4.weights release byte-for-byte in SIZE (257,717,640 bytes) and a
full-size replica blob loads end-to-end through detection
(tests/test_darknet_import.py::test_real_yolov4_full_weights_replica_
end_to_end). Only the VALUES remain unexercised (zero-egress container
— no real weights file is bundled); structure, ordering and sizing are
pinned.
"""

from __future__ import annotations

import io
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from paddlerobotics_tpu.hri.perception.backbones import mish


def parse_cfg(text: str) -> Tuple[Tuple[str, Tuple[Tuple[str, str], ...]],
                                  ...]:
    """Parse darknet .cfg text → ((section_type, ((key, value), ...)), ...).

    Hashable (usable as a flax Module field). The [net] section is kept
    (index 0) but produces no layer.
    """
    sections: List[Tuple[str, Tuple[Tuple[str, str], ...]]] = []
    cur_type, cur_opts = None, []
    for raw in text.splitlines():
        line = raw.split("#")[0].strip()
        if not line:
            continue
        if line.startswith("["):
            if cur_type is not None:
                sections.append((cur_type, tuple(cur_opts)))
            cur_type, cur_opts = line.strip("[]").strip(), []
        elif "=" in line and cur_type is not None:
            k, v = line.split("=", 1)
            cur_opts.append((k.strip(), v.strip()))
    if cur_type is not None:
        sections.append((cur_type, tuple(cur_opts)))
    return tuple(sections)


def _get(opts, key, default=None):
    for k, v in opts:
        if k == key:
            return v
    return default


def _ints(s: str) -> List[int]:
    return [int(x) for x in s.replace(" ", "").split(",") if x != ""]


class DarknetNet(nn.Module):
    """Interpret parsed cfg sections as a forward pass.

    Returns (yolo_outputs, layer_outputs): raw head tensors in cfg order
    plus every layer's output (for feature-map taps, e.g. the RoIAlign
    source). Conv/BN modules are named conv{i}/bn{i} by cfg section
    index so the weight importer addresses them directly.
    """

    sections: tuple

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs: List[jnp.ndarray] = []
        yolo_outs: List[jnp.ndarray] = []
        h = x
        for li, (ltype, opt) in enumerate(self.sections):
            if ltype in ("net", "network"):
                outs.append(h)
                continue
            if ltype == "convolutional":
                bn = _get(opt, "batch_normalize", "0") == "1"
                filters = int(_get(opt, "filters"))
                size = int(_get(opt, "size", "1"))
                stride = int(_get(opt, "stride", "1"))
                pad = size // 2 if _get(opt, "pad", "0") == "1" else \
                    int(_get(opt, "padding", "0"))
                act = _get(opt, "activation", "linear")
                # darknet pads symmetrically then convolves VALID — for
                # stride 2 this differs from XLA's SAME by one pixel, so
                # use explicit padding.
                h = nn.Conv(filters, (size, size), strides=stride,
                            padding=[(pad, pad), (pad, pad)],
                            use_bias=not bn, name=f"conv{li}")(h)
                if bn:
                    h = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.99, epsilon=1e-5,
                                     name=f"bn{li}")(h)
                if act == "leaky":
                    h = nn.leaky_relu(h, 0.1)
                elif act == "mish":
                    h = mish(h)
                elif act == "relu":
                    h = nn.relu(h)
                # "linear" → identity
            elif ltype == "route":
                idxs = _ints(_get(opt, "layers"))
                srcs = [outs[i if i >= 0 else li + i] for i in idxs]
                h = jnp.concatenate(srcs, axis=-1) if len(srcs) > 1 \
                    else srcs[0]
                groups = int(_get(opt, "groups", "1"))
                if groups > 1:
                    gid = int(_get(opt, "group_id", "0"))
                    c = h.shape[-1] // groups
                    h = h[..., gid * c:(gid + 1) * c]
            elif ltype == "shortcut":
                frm = int(_get(opt, "from"))
                src = outs[frm if frm >= 0 else li + frm]
                h = outs[-1] + src
                if _get(opt, "activation", "linear") == "leaky":
                    h = nn.leaky_relu(h, 0.1)
            elif ltype == "maxpool":
                size = int(_get(opt, "size", "2"))
                stride = int(_get(opt, "stride", str(size)))
                h = nn.max_pool(h, (size, size), (stride, stride),
                                padding="SAME")
            elif ltype == "upsample":
                s = int(_get(opt, "stride", "2"))
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * s, W * s, C), "nearest")
            elif ltype == "yolo":
                yolo_outs.append(outs[-1])
                h = outs[-1]
            else:
                raise ValueError(f"unsupported darknet section [{ltype}]")
            outs.append(h)
        return yolo_outs, outs


def yolo_meta(sections) -> List[dict]:
    """Per-[yolo]-head decode metadata: anchors (masked), classes,
    scale_x_y — yolov4.cfg uses 1.2/1.1/1.05 per scale."""
    metas = []
    for ltype, opt in sections:
        if ltype != "yolo":
            continue
        anchors = _ints(_get(opt, "anchors"))
        anchors = [(anchors[2 * i], anchors[2 * i + 1])
                   for i in range(len(anchors) // 2)]
        mask = _ints(_get(opt, "mask"))
        metas.append({
            "anchors": tuple(anchors[m] for m in mask),
            "classes": int(_get(opt, "classes", "80")),
            "scale_xy": float(_get(opt, "scale_x_y", "1.0")),
        })
    return metas


def _conv_layers(sections):
    for li, (ltype, opt) in enumerate(sections):
        if ltype == "convolutional":
            yield li, _get(opt, "batch_normalize", "0") == "1"


def load_darknet_weights(variables, sections, weights) -> dict:
    """Fill a DarknetNet variable tree from darknet .weights bytes/path.

    Serialization (darknet save_convolutional_weights): per conv, with
    batch_normalize: biases(β), scales(γ), rolling_mean, rolling_var,
    then kernels in OIHW; without: biases then kernels. 20-byte header
    (major, minor, revision int32 + seen int64 for version ≥ 2).
    """
    if isinstance(weights, (str, bytes)):
        data = open(weights, "rb").read() if isinstance(weights, str) \
            else weights
    else:
        data = weights.read()
    buf = io.BytesIO(data)
    major, minor, _rev = np.frombuffer(buf.read(12), np.int32)
    if major * 10 + minor >= 2:
        buf.read(8)                      # seen: int64
    else:
        buf.read(4)                      # seen: int32
    floats = np.frombuffer(buf.read(), np.float32)

    params = jax.tree.map(np.asarray, jax.device_get(variables))
    params = {"params": dict(params["params"]),
              "batch_stats": dict(params.get("batch_stats", {}))}
    pos = 0

    def take(n):
        nonlocal pos
        out = floats[pos:pos + n]
        if out.size != n:
            raise ValueError("weights file too short")
        pos += n
        return out.copy()

    for li, has_bn in _conv_layers(sections):
        name = f"conv{li}"
        kern = np.asarray(params["params"][name]["kernel"])  # (k,k,in,out)
        k, _, cin, cout = kern.shape
        if has_bn:
            beta = take(cout)
            gamma = take(cout)
            mean = take(cout)
            var = take(cout)
            params["params"][f"bn{li}"] = {"scale": gamma, "bias": beta}
            params["batch_stats"][f"bn{li}"] = {"mean": mean, "var": var}
        else:
            bias = take(cout)
            params["params"][name] = dict(params["params"][name],
                                          bias=bias)
        w = take(cout * cin * k * k).reshape(cout, cin, k, k)
        new = dict(params["params"].get(name, {}))
        new["kernel"] = w.transpose(2, 3, 1, 0)   # OIHW → HWIO
        params["params"][name] = new
    if pos != floats.size:
        raise ValueError(
            f"weights file has {floats.size} floats, consumed {pos} — "
            "cfg/weights mismatch")
    return jax.tree.map(jnp.asarray, params)


def save_darknet_weights(variables, sections) -> bytes:
    """Inverse of `load_darknet_weights` (round-trip testing + export)."""
    out = io.BytesIO()
    out.write(np.asarray([0, 2, 0], np.int32).tobytes())
    out.write(np.asarray([0], np.int64).tobytes())
    params = jax.device_get(variables)
    for li, has_bn in _conv_layers(sections):
        name = f"conv{li}"
        kern = np.asarray(params["params"][name]["kernel"])
        if has_bn:
            bn = params["params"][f"bn{li}"]
            st = params["batch_stats"][f"bn{li}"]
            for a in (bn["bias"], bn["scale"], st["mean"], st["var"]):
                out.write(np.asarray(a, np.float32).tobytes())
        else:
            out.write(np.asarray(params["params"][name]["bias"],
                                 np.float32).tobytes())
        out.write(np.asarray(kern, np.float32).transpose(3, 2, 0, 1)
                  .tobytes())
    return out.getvalue()
