"""ReID appearance encoder for Deep-SORT (cosine-metric features).

Rebuild of HRI/TFVT_HRI/perception/tracker/re_id.py (which runs the
frozen TF1 `mars-small128.pb` graph): the same wide-residual
architecture (conv → 6 residual blocks → dense 128 → L2-BN) in flax,
producing unit-norm 128-d features for 64×128 person crops.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class _Residual(nn.Module):
    features: int
    down: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = 2 if self.down else 1
        h = nn.BatchNorm(use_running_average=not train)(x)
        h = nn.elu(h)
        h = nn.Conv(self.features, (3, 3), strides=s, padding="SAME")(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.elu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME")(h)
        if x.shape[-1] != self.features or self.down:
            x = nn.Conv(self.features, (1, 1), strides=s)(x)
        return x + h


class MarsSmall128(nn.Module):
    """64×128×3 crop → 128-d unit feature (mars-small128 topology)."""

    feature_dim: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(32, (3, 3), padding="SAME")(x)
        h = nn.elu(nn.BatchNorm(use_running_average=not train)(h))
        h = nn.Conv(32, (3, 3), padding="SAME")(h)
        h = nn.elu(nn.BatchNorm(use_running_average=not train)(h))
        h = nn.max_pool(h, (3, 3), (2, 2), padding="SAME")
        h = _Residual(32)(h, train)
        h = _Residual(32)(h, train)
        h = _Residual(64, down=True)(h, train)
        h = _Residual(64)(h, train)
        h = _Residual(128, down=True)(h, train)
        h = _Residual(128)(h, train)
        h = h.reshape(h.shape[0], -1)
        h = nn.Dense(self.feature_dim)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        return h / jnp.maximum(
            jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-9)
