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


def import_tf_consts(consts, feature_dim: int = 128):
    """Frozen-graph Const tensors → flax `MarsSmall128` variables.

    `consts`: ordered {name: ndarray} as returned by
    `tf_graph.parse_graph_consts` on a frozen `mars-small128.pb`
    (re_id.py:22-48 runs that graph through a TF1 session; here the
    weights are lifted into the flax rebuild instead).

    Mapping is structural — graph order + shapes, not names (freeze
    scripts differ in scoping). Conventions, validated by the
    round-trip test in tests/test_hri_perception.py:
      * a 4-D const is the next expected conv kernel (TF HWIO = flax
        HWIO, no transpose); shape is asserted;
      * a run of 1-D consts following a kernel is its BatchNorm group:
        3 tensors → (beta, mean, var) with scale fixed at 1 (slim's
        `scale=False` freeze), 4 tensors → (gamma, beta, mean, var);
      * the single 2-D const is the fc1 kernel (TF (in,out) = flax);
      * conv biases are assumed absent (every conv is BN-followed);
        flax bias leaves stay zero.
    If a real checkpoint deviates (e.g. extra biases), the shape
    asserts fail loudly with the offending const's position.
    """
    import numpy as np

    seq = [np.asarray(v, np.float32) for v in consts.values()
           if np.asarray(v).ndim in (1, 2, 4)]
    pos = 0

    def take_kernel(shape):
        nonlocal pos
        assert pos < len(seq), f"ran out of consts at kernel {shape}"
        if seq[pos].ndim == 1:
            raise ValueError(
                f"unexpected 1-D const at position {pos} "
                f"(len {seq[pos].shape[0]}) while looking for kernel "
                f"{shape}")
        k = seq[pos]
        assert tuple(k.shape) == tuple(shape), (pos, k.shape, shape)
        pos += 1
        return jnp.asarray(k)

    def take_bn(width):
        nonlocal pos
        group = []
        while (pos < len(seq) and seq[pos].ndim == 1 and
               seq[pos].shape[0] == width and len(group) < 4):
            group.append(seq[pos])
            pos += 1
        if len(group) == 3:
            gamma = jnp.ones(width, jnp.float32)
            beta, mean, var = (jnp.asarray(g) for g in group)
        elif len(group) == 4:
            gamma, beta, mean, var = (jnp.asarray(g) for g in group)
        else:
            raise ValueError(
                f"expected BatchNorm group (3 or 4 1-D consts of len "
                f"{width}) at position {pos}, got {len(group)}")
        return ({"scale": gamma, "bias": beta},
                {"mean": mean, "var": var})

    params: dict = {}
    stats: dict = {}

    def put(path, p, s=None):
        node_p, node_s = params, stats
        for k in path[:-1]:
            node_p = node_p.setdefault(k, {})
            node_s = node_s.setdefault(k, {})
        node_p[path[-1]] = p
        if s is not None:
            node_s[path[-1]] = s

    def conv(path, shape):
        put(path, {"kernel": take_kernel(shape),
                   "bias": jnp.zeros(shape[-1], jnp.float32)})

    def bn(path, width):
        p, s = take_bn(width)
        put(path, p, s)

    conv(("Conv_0",), (3, 3, 3, 32))
    bn(("BatchNorm_0",), 32)
    conv(("Conv_1",), (3, 3, 32, 32))
    bn(("BatchNorm_1",), 32)

    widths = [(32, 32, False), (32, 32, False), (32, 64, True),
              (64, 64, False), (64, 128, True), (128, 128, False)]
    for i, (cin, cout, down) in enumerate(widths):
        r = (f"_Residual_{i}",)
        bn(r + ("BatchNorm_0",), cin)
        conv(r + ("Conv_0",), (3, 3, cin, cout))
        bn(r + ("BatchNorm_1",), cout)
        conv(r + ("Conv_1",), (3, 3, cout, cout))
        if down or cin != cout:
            conv(r + ("Conv_2",), (1, 1, cin, cout))

    fc_in = 128 * (128 // 8) * (64 // 8)      # 3 stride-2 stages
    put(("Dense_0",), {"kernel": take_kernel((fc_in, feature_dim)),
                       "bias": jnp.zeros(feature_dim, jnp.float32)})
    bn(("BatchNorm_2",), feature_dim)

    if pos != len(seq):
        raise ValueError(f"{len(seq) - pos} unconsumed consts "
                         f"(first at position {pos}, shape "
                         f"{seq[pos].shape})")
    return {"params": params, "batch_stats": stats}
