"""Detection/classification backbones in flax (NHWC, bfloat16-friendly).

Rebuilds of HRI/TFVT_HRI/perception/common/backbone.py (ResNet,
MobileNetV2 at backbone.py:34-596) and the CSPDarknet53 trunk implied by
the x2paddle-converted YOLOv4 graph (scene/x2paddle_yolov4.py): clean
flax modules instead of machine-generated static graphs.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def mish(x):
    return x * jnp.tanh(nn.softplus(x))


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    act: str = "leaky"    # leaky|mish|relu6|none
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding="SAME", use_bias=False,
                    feature_group_count=self.groups)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3)(x)
        if self.act == "leaky":
            x = nn.leaky_relu(x, 0.1)
        elif self.act == "mish":
            x = mish(x)
        elif self.act == "relu6":
            x = jnp.minimum(nn.relu(x), 6.0)
        return x


# ----------------------------- MobileNetV2 -----------------------------------

class InvertedResidual(nn.Module):
    features: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        h = x
        if self.expand != 1:
            h = ConvBN(inp * self.expand, 1, act="relu6")(h, train)
        h = ConvBN(inp * self.expand, 3, self.stride, act="relu6",
                   groups=inp * self.expand)(h, train)
        h = ConvBN(self.features, 1, act="none")(h, train)
        if self.stride == 1 and inp == self.features:
            h = h + x
        return h


class MobileNetV2(nn.Module):
    """Standard MobileNetV2 trunk → global-average-pooled feature
    (backbone.py MobileNetV2; used for instance crops in the inst_crop
    ablation, attention_ctrl.py:330-348)."""

    width: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
               (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2),
               (6, 320, 1, 1)]
        h = ConvBN(int(32 * self.width), 3, 2, act="relu6")(x, train)
        for t, c, n, s in cfg:
            for i in range(n):
                h = InvertedResidual(int(c * self.width),
                                     s if i == 0 else 1, t)(h, train)
        h = ConvBN(int(1280 * self.width), 1, act="relu6")(h, train)
        return jnp.mean(h, axis=(1, 2))


# ------------------------------- ResNet --------------------------------------

class BottleneckBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBN(self.features, 1, act="relu6")(x, train)
        h = ConvBN(self.features, 3, self.stride, act="relu6")(h, train)
        h = ConvBN(self.features * 4, 1, act="none")(h, train)
        if x.shape[-1] != self.features * 4 or self.stride != 1:
            x = ConvBN(self.features * 4, 1, self.stride, act="none")(x, train)
        return nn.relu(h + x)


class ResNet(nn.Module):
    """ResNet-50-style backbone returning C3/C4/C5 (backbone.py ResNet)."""

    depths: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBN(64, 7, 2, act="relu6")(x, train)
        h = nn.max_pool(h, (3, 3), (2, 2), padding="SAME")
        feats = []
        for i, d in enumerate(self.depths):
            for j in range(d):
                h = BottleneckBlock(64 * 2 ** i,
                                    2 if (j == 0 and i > 0) else 1)(h, train)
            feats.append(h)
        return feats[1], feats[2], feats[3]   # C3, C4, C5


# ---------------------------- CSPDarknet53 -----------------------------------

class DarkResBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBN(self.features, 1, act="mish")(x, train)
        h = ConvBN(self.features, 3, act="mish")(h, train)
        return x + h


class CSPStage(nn.Module):
    features: int
    blocks: int
    first: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBN(self.features, 3, 2, act="mish")(x, train)
        split = self.features if self.first else self.features // 2
        route = ConvBN(split, 1, act="mish")(h, train)
        h = ConvBN(split, 1, act="mish")(h, train)
        for _ in range(self.blocks):
            h = DarkResBlock(split if self.first else split)(h, train)
        h = ConvBN(split, 1, act="mish")(h, train)
        h = jnp.concatenate([h, route], axis=-1)
        return ConvBN(self.features, 1, act="mish")(h, train)


class CSPDarknet53(nn.Module):
    """YOLOv4 trunk; returns (C3 /8, C4 /16, C5 /32)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBN(32, 3, act="mish")(x, train)
        h = CSPStage(64, 1, first=True)(h, train)
        h = CSPStage(128, 2)(h, train)
        c3 = CSPStage(256, 8)(h, train)
        c4 = CSPStage(512, 8)(c3, train)
        c5 = CSPStage(1024, 4)(c4, train)
        return c3, c4, c5


class Darknet53(nn.Module):
    """YOLOv3 trunk (leaky-ReLU residual stages)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        def res_stage(h, feats, n):
            h = ConvBN(feats, 3, 2)(h, train)
            for _ in range(n):
                r = ConvBN(feats // 2, 1)(h, train)
                r = ConvBN(feats, 3)(r, train)
                h = h + r
            return h

        h = ConvBN(32, 3)(x, train)
        h = res_stage(h, 64, 1)
        h = res_stage(h, 128, 2)
        c3 = res_stage(h, 256, 8)
        c4 = res_stage(c3, 512, 8)
        c5 = res_stage(c4, 1024, 4)
        return c3, c4, c5
