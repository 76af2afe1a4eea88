"""R(2+1)D video action-recognition baseline in flax.

Rebuild of HRI/TFVT_HRI/baselines/r2plus1d/ (model.py:11-109 wrapping
Microsoft utils_cv's torchvision r2plus1d_18 with nn.DataParallel): the
factorized (2+1)D residual architecture natively in flax; multi-GPU
eval DataParallel becomes batch sharding over the mesh.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class Conv2Plus1D(nn.Module):
    """3D conv factorized into spatial (1,k,k) + temporal (k,1,1) with an
    intermediate width keeping parameter count comparable."""

    features: int
    mid: int
    stride: tuple = (1, 1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        st, sh, sw = self.stride
        x = nn.Conv(self.mid, (1, 3, 3), strides=(1, sh, sw),
                    padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 1, 1), strides=(st, 1, 1),
                    padding="SAME", use_bias=False)(x)
        return x


def _mid_channels(in_ch, out_ch):
    return (3 * 3 * 3 * in_ch * out_ch) // (3 * 3 * in_ch + 3 * out_ch)


class R2Plus1DBlock(nn.Module):
    features: int
    stride: tuple = (1, 1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        mid = _mid_channels(inp, self.features)
        h = Conv2Plus1D(self.features, mid, self.stride)(x, train)
        h = nn.relu(nn.BatchNorm(use_running_average=not train)(h))
        mid2 = _mid_channels(self.features, self.features)
        h = Conv2Plus1D(self.features, mid2)(h, train)
        h = nn.BatchNorm(use_running_average=not train)(h)
        if inp != self.features or self.stride != (1, 1, 1):
            x = nn.Conv(self.features, (1, 1, 1), strides=self.stride,
                        use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.relu(h + x)


R2PLUS1D18_BLOCKS = ((64, (1, 1, 1)), (64, (1, 1, 1)),
                     (128, (2, 2, 2)), (128, (1, 1, 1)),
                     (256, (2, 2, 2)), (256, (1, 1, 1)),
                     (512, (2, 2, 2)), (512, (1, 1, 1)))


class R2Plus1D18(nn.Module):
    """18-layer R(2+1)D; input (B,T,H,W,3) → class logits.

    `blocks` defaults to the r2plus1d_18 stage plan; smaller plans give
    CPU-testable variants with the identical structure."""

    num_classes: int = 2
    blocks: tuple = R2PLUS1D18_BLOCKS

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = Conv2Plus1D(64, 45, (1, 2, 2))(x, train)
        h = nn.relu(nn.BatchNorm(use_running_average=not train)(h))
        for feats, stride in self.blocks:
            h = R2Plus1DBlock(feats, tuple(stride))(h, train)
        h = jnp.mean(h, axis=(1, 2, 3))
        return nn.Dense(self.num_classes)(h)
