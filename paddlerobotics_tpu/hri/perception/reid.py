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

    Mapping is structural — graph order + shapes — with BatchNorm
    groups delimited by the const NODE NAME's scope (everything before
    the last '/'): two adjacent BatchNorms of the same width (e.g. the
    stem's second BN straight into the first residual's pre-activation
    BN) live in different scopes, so grouping never bleeds across.
    Conventions, validated by the round-trip test in
    tests/test_hri_perception.py:
      * a 4-D const is the next expected conv kernel (TF HWIO = flax
        HWIO, no transpose); shape is asserted;
      * the 1-D consts sharing one scope after a kernel are its
        BatchNorm group; within the group, tensors are assigned by
        name suffix (gamma/beta/mean/var[iance] — TF's standard slim
        names) with positional fallback: 3 tensors → (beta, mean, var)
        and scale fixed at 1 (slim's `scale=False` freeze), 4 →
        (gamma, beta, mean, var);
      * the single 2-D const is the fc1 kernel (TF (in,out) = flax);
      * conv biases are assumed absent (every conv is BN-followed);
        flax bias leaves stay zero.
    If a real checkpoint deviates (e.g. extra biases), the shape
    asserts fail loudly with the offending const's position.
    """
    import numpy as np

    seq = [(name, np.asarray(v, np.float32)) for name, v in consts.items()
           if np.asarray(v).ndim in (1, 2, 4)]
    pos = 0

    def scope(name):
        return name.rsplit("/", 1)[0] if "/" in name else ""

    def take_kernel(shape):
        nonlocal pos
        assert pos < len(seq), f"ran out of consts at kernel {shape}"
        name, k = seq[pos]
        if k.ndim == 1:
            raise ValueError(
                f"unexpected 1-D const {name!r} at position {pos} "
                f"(len {k.shape[0]}) while looking for kernel {shape}")
        assert tuple(k.shape) == tuple(shape), (pos, name, k.shape, shape)
        pos += 1
        return jnp.asarray(k)

    def take_bn(width):
        nonlocal pos
        group = []
        group_scope = None
        while pos < len(seq) and seq[pos][1].ndim == 1 and len(group) < 4:
            name, arr = seq[pos]
            if arr.shape[0] != width:
                break
            if group_scope is None:
                group_scope = scope(name)
            elif scope(name) != group_scope:
                break                          # next BN's scope begins
            group.append((name, arr))
            pos += 1
        by_suffix = {}
        leftovers = []
        for name, arr in group:
            low = name.rsplit("/", 1)[-1].lower()
            for key, tags in (("scale", ("gamma",)), ("bias", ("beta",)),
                              ("mean", ("mean",)), ("var", ("var",))):
                if any(t in low for t in tags) and key not in by_suffix:
                    by_suffix[key] = arr
                    break
            else:
                leftovers.append(arr)
        if len(by_suffix) + len(leftovers) != len(group):
            raise AssertionError("bn grouping bookkeeping")
        if len(by_suffix) == len(group) and len(group) in (3, 4):
            gamma = by_suffix.get("scale")
            beta, mean, var = (by_suffix.get(k) for k in
                               ("bias", "mean", "var"))
            if beta is None or mean is None or var is None:
                raise ValueError(
                    f"BatchNorm group {group_scope!r} missing "
                    f"beta/mean/var (have {sorted(by_suffix)})")
        elif len(group) == 3:                  # positional fallback
            gamma = None
            (_, beta), (_, mean), (_, var) = group
        elif len(group) == 4:
            (_, gamma), (_, beta), (_, mean), (_, var) = group
        else:
            raise ValueError(
                f"expected BatchNorm group (3 or 4 1-D consts of len "
                f"{width}) in scope {group_scope!r} at position {pos}, "
                f"got {len(group)}")
        if gamma is None:
            gamma = np.ones(width, np.float32)
        return ({"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)},
                {"mean": jnp.asarray(mean), "var": jnp.asarray(var)})

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
                         f"(first: {seq[pos][0]!r} shape "
                         f"{seq[pos][1].shape})")
    return {"params": params, "batch_stats": stats}
