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
    """3D conv factorized into spatial (1,k,k) + temporal (3,1,1) with an
    intermediate width keeping parameter count comparable.

    Padding is explicit symmetric (k//2) — identical to SAME at stride 1
    but matching torch's window placement at stride 2, so torchvision
    r2plus1d_18 weights imported via `import_torch_state_dict` reproduce
    the torch forward exactly."""

    features: int
    mid: int
    stride: tuple = (1, 1, 1)
    spatial_kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        st, sh, sw = self.stride
        k = self.spatial_kernel
        p = k // 2
        x = nn.Conv(self.mid, (1, k, k), strides=(1, sh, sw),
                    padding=((0, 0), (p, p), (p, p)), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 1, 1), strides=(st, 1, 1),
                    padding=((1, 1), (0, 0), (0, 0)), use_bias=False)(x)
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
    stem_kernel: int = 7    # 7 = torchvision r2plus1d_18; 3 for tiny tests

    @nn.compact
    def __call__(self, x, train: bool = False):
        # R2Plus1dStem: (1,7,7) spatial s(1,2,2) → BN → ReLU → (3,1,1)
        # temporal → BN → ReLU (torchvision VideoResNet geometry, so
        # r2plus1d_18 checkpoints import weight-for-weight).
        h = Conv2Plus1D(64, 45, (1, 2, 2),
                        spatial_kernel=self.stem_kernel)(x, train)
        h = nn.relu(nn.BatchNorm(use_running_average=not train)(h))
        for feats, stride in self.blocks:
            h = R2Plus1DBlock(feats, tuple(stride))(h, train)
        h = jnp.mean(h, axis=(1, 2, 3))
        return nn.Dense(self.num_classes)(h)


def import_torch_state_dict(state_dict):
    """torchvision `r2plus1d_18` state_dict → flax variables.

    The weight-import path for the baseline's ig65m/kinetics pretrain
    (the reference loads it via utils_cv/torchvision,
    baselines/r2plus1d/model.py:11-31). Works on any object exposing
    torch's VideoResNet key schema (`stem.0.weight`,
    `layer{L}.{i}.conv1.0.0.weight`, ..., `fc.weight`); values may be
    torch tensors or numpy arrays. Returns
    `{"params": ..., "batch_stats": ...}` ready for
    `R2Plus1D18(num_classes=fc_out).apply`.
    """
    import numpy as np

    def arr(key):
        v = state_dict[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)

    def conv(key):
        # torch (out,in,t,h,w) → flax (t,h,w,in,out)
        return jnp.asarray(arr(key).transpose(2, 3, 4, 1, 0))

    def bn(prefix):
        p = {"scale": jnp.asarray(arr(prefix + ".weight")),
             "bias": jnp.asarray(arr(prefix + ".bias"))}
        s = {"mean": jnp.asarray(arr(prefix + ".running_mean")),
             "var": jnp.asarray(arr(prefix + ".running_var"))}
        return p, s

    params, stats = {}, {}

    def put(path, p, s=None):
        params[path] = p
        if s is not None:
            stats[path] = s

    def c2p1d(torch_prefix, flax_path):
        """One torch Conv2Plus1D (Sequential: conv,bn,relu,conv)."""
        bp, bs = bn(torch_prefix + ".1")
        put(flax_path + ("Conv_0",), {"kernel": conv(torch_prefix + ".0.weight")})
        put(flax_path + ("BatchNorm_0",), bp, bs)
        put(flax_path + ("Conv_1",), {"kernel": conv(torch_prefix + ".3.weight")})

    # stem: conv/bn pairs live inside our stem Conv2Plus1D_0, the second
    # BN is the model-level BatchNorm_0.
    c2p1d("stem", ("Conv2Plus1D_0",))
    bp, bs = bn("stem.4")
    put(("BatchNorm_0",), bp, bs)

    idx = 0
    for layer in range(1, 5):
        for i in range(2):
            t = f"layer{layer}.{i}"
            f = (f"R2Plus1DBlock_{idx}",)
            c2p1d(t + ".conv1.0", f + ("Conv2Plus1D_0",))
            bp, bs = bn(t + ".conv1.1")
            put(f + ("BatchNorm_0",), bp, bs)
            c2p1d(t + ".conv2.0", f + ("Conv2Plus1D_1",))
            bp, bs = bn(t + ".conv2.1")
            put(f + ("BatchNorm_1",), bp, bs)
            if t + ".downsample.0.weight" in state_dict:
                put(f + ("Conv_0",),
                    {"kernel": conv(t + ".downsample.0.weight")})
                bp, bs = bn(t + ".downsample.1")
                put(f + ("BatchNorm_2",), bp, bs)
            idx += 1
    assert idx == len(R2PLUS1D18_BLOCKS)  # importer is 18-layer-specific

    put(("Dense_0",), {"kernel": jnp.asarray(arr("fc.weight").T),
                       "bias": jnp.asarray(arr("fc.bias"))})

    def nest(flat):
        tree = {}
        for path, leaf in flat.items():
            node = tree
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = leaf
        return tree

    flat_p = {path + (k,): v for path, d in params.items()
              for k, v in d.items()}
    flat_s = {path + (k,): v for path, d in stats.items()
              for k, v in d.items()}
    return {"params": nest(flat_p), "batch_stats": nest(flat_s)}
