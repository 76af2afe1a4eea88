"""Round-2 HRI depth: video augmentation, salutation dataset,
R(2+1)D train/eval/program stack, and full-negative mining feeding the
attention-controller loader (VERDICT items 8 and 9)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerobotics_tpu.hri.augment import (SALUTATION_TREE,
                                            SalutationDataset,
                                            VideoAugmentor)
from paddlerobotics_tpu.hri.r2plus1d import R2Plus1D18
from paddlerobotics_tpu.hri import r2plus1d_train as r2t


# -- VideoAugmentor ------------------------------------------------------------

def test_video_augmentor_intensity():
    clip = 0.5 * np.ones((4, 8, 8, 3), np.float32)
    # always-on multipliers compose deterministically
    aug = VideoAugmentor(intensity_mul_probs=[1.0, 1.0],
                         intensity_mul_values=[1.1, 0.9], seed=0)
    out = aug(clip)
    np.testing.assert_allclose(out, 0.5 * 1.1 * 0.9, atol=1e-6)
    # clipped to [0,1]
    bright = VideoAugmentor([1.0], [3.0])(clip)
    assert bright.max() <= 1.0
    # probability 0 → identity
    none = VideoAugmentor([0.0, 0.0], [1.1, 0.9])(clip)
    np.testing.assert_array_equal(none, clip)
    # frequency roughly matches prob
    aug = VideoAugmentor([0.3], [1.1], seed=1)
    changed = sum(float(aug(clip).max()) > 0.5 for _ in range(300))
    assert 50 < changed < 130


# -- SalutationDataset ---------------------------------------------------------

def test_salutation_dataset(tmp_path):
    annos = {
        "vidA_01_x.jsonl": [
            {"ID": 1, "Salutation": "man"},
            {"ID": 2, "Salutation": "null"},        # dropped
            {"ID": 3, "Salutation": "young_girl"},
        ],
        "vidB_01_x.jsonl": [{"ID": 1, "Salutation": "aunt"}],
        "vidC_01_x.jsonl": [{"ID": 4, "Salutation": "uncle"}],
        "vidD_01_x.jsonl": [{"ID": 5, "Salutation": "woman"}],
        "vidE_01_x.jsonl": [{"ID": 6, "Salutation": "young_boy"}],
    }
    for fname, rows in annos.items():
        with open(tmp_path / fname, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    ds = SalutationDataset(str(tmp_path), test_percentage=0.2, seed=0)
    assert len(ds.annos) == 6            # null dropped
    # split is BY VIDEO: no video appears in both
    train_vids = {a.video for a in ds.train}
    test_vids = {a.video for a in ds.test}
    assert not (train_vids & test_vids)
    assert len(test_vids) == 1
    # decision-tree targets (data.py:181-194)
    by_label = {a.salutation: a.tree_targets for a in ds.annos}
    assert by_label["man"] == ("100", 0, -1, -1)
    assert by_label["young_girl"] == ("101", 1, -1, 0)
    assert by_label["uncle"] == ("110", 0, 1, -1)
    # build with a crop hook; None skips
    built = ds.build(lambda s: None if s.salutation == "uncle"
                     else np.ones(4))
    total = len(built["train"]) + len(built["test"])
    assert total == 5


# -- R(2+1)D stack -------------------------------------------------------------

def _synthetic_loader(T=8, hw=32):
    """Clips whose mean intensity encodes the class."""
    def load(video, t):
        label = int(video.split("_")[-1])
        rng = np.random.RandomState((hash(video) + t) % 2**31)
        base = 0.15 + 0.3 * label
        return np.clip(base + 0.05 * rng.randn(T, hw, hw, 3), 0, 1)
    return load


def test_r2plus1d_trains_on_synthetic_clips():
    annos = [r2t.ClipAnno(f"pos_{i % 2 + 1}", t, wae_id=i % 2 + 1)
             for i, t in enumerate(range(0, 4000, 250))]
    negs = [f"neg_0"] * 8
    data = r2t.ClipDataset(annos, negs, _synthetic_loader(hw=32),
                           num_classes=3, group_by="WAE_id",
                           test_frac=0.25, seed=0)
    tiny = ((32, (1, 1, 1)), (64, (2, 2, 2)))   # CPU-sized stage plan
    tr = r2t.R2Plus1DTrainer(num_classes=3, lr=5e-4, input_hw=32,
                             blocks=tiny, stem_kernel=3)
    # enough steps for BatchNorm running stats (momentum .99) to settle
    hist = tr.fit(data, epochs=25, batch_size=4)
    assert np.isfinite(hist["loss"])
    res = tr.evaluate(data, batch_size=4)
    assert res["accuracy"] >= 0.6, res["accuracy"]
    # precision/recall sweep over trigger threshold
    rows = r2t.precision_recall_sweep(res["probs"], res["labels"])
    assert len(rows) == 19
    assert all(0 <= r["precision"] <= 1 and 0 <= r["recall"] <= 1
               for r in rows)
    # recall is monotonically non-increasing in the threshold
    recalls = [r["recall"] for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(recalls, recalls[1:]))


def test_r2plus1d_inference_program():
    model = R2Plus1D18(num_classes=5, blocks=((32, (1, 1, 1)),))
    clip = jnp.zeros((2, 4, 32, 32, 3))
    variables = model.init(jax.random.key(0), clip, True)
    infer = r2t.make_inference_fn(model, null_act_idx=0)
    probs, sample = infer(variables, clip, 0.7, 3, jax.random.key(1))
    assert probs.shape == (2, 5)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    # sampled action is never the null action (program.py:44-50)
    assert np.all(np.asarray(sample) != 0)


# -- full-negative mining → attention loader ----------------------------------

def test_full_negative_mining_feeds_attention_training():
    """End-to-end: mined negatives enter the window sampler, the loader
    assembles controller feeds, and negative windows carry has_act=0."""
    from paddlerobotics_tpu.hri.data import (AnnotatedMoment,
                                             PrefetchLoader, WindowSampler,
                                             assemble_training_sample)

    pos = [AnnotatedMoment("vid_pos", 40 + i, act_id=3) for i in range(5)]
    sampler = WindowSampler(pos, num_frames=4, neg_ratio=1.0, seed=0)
    mined = [AnnotatedMoment(f"neg_clip_{i}", 10, act_id=0)
             for i in range(5)]
    sampler.add_negatives(mined)

    F, K, D = 4, 3, 562

    def tokenize(batch):
        feeds = []
        for video, frames, act_id, positive in batch:
            tokens = np.random.RandomState(len(video)).rand(F, K, D)
            valid = np.ones((F, K))
            feeds.append(assemble_training_sample(
                tokens, valid, act_id, positive, target_token=0))
        return {k: np.stack([f[k] for f in feeds]) for k in feeds[0]}

    loader = PrefetchLoader(sampler.sample, tokenize, batch_size=8)
    batch = next(iter(loader))
    loader.close()
    assert batch["visual_tokens"].shape == (8, F * K, D)
    has_act = batch["has_act"][:, -1]
    # with neg_ratio 1.0 both classes appear in a batch of 8 w.h.p.
    assert 0 < has_act.sum() < 8
    # negative windows carry act_id 0 everywhere
    neg_rows = has_act == 0
    assert np.all(batch["act_ids"][neg_rows] == 0)


# -- torch → flax weight import ------------------------------------------------

def _torch_r2plus1d_18(num_classes):
    """torchvision r2plus1d_18 layout in pure torch (torchvision is not
    in this image): same module tree → identical state_dict key schema
    (stem.0, layer{L}.{i}.conv1.0.0, ..., fc), so real checkpoints load
    the same way the synthetic one does here."""
    import torch.nn as tnn

    def midplanes(inp, out):
        return (inp * out * 3 * 3 * 3) // (inp * 3 * 3 + 3 * out)

    def conv2plus1d(inp, out, mid, stride=1):
        return tnn.Sequential(
            tnn.Conv3d(inp, mid, (1, 3, 3), stride=(1, stride, stride),
                       padding=(0, 1, 1), bias=False),
            tnn.BatchNorm3d(mid),
            tnn.ReLU(inplace=True),
            tnn.Conv3d(mid, out, (3, 1, 1), stride=(stride, 1, 1),
                       padding=(1, 0, 0), bias=False))

    class BasicBlock(tnn.Module):
        def __init__(self, inp, planes, stride=1):
            super().__init__()
            self.conv1 = tnn.Sequential(
                conv2plus1d(inp, planes, midplanes(inp, planes), stride),
                tnn.BatchNorm3d(planes), tnn.ReLU(inplace=True))
            self.conv2 = tnn.Sequential(
                conv2plus1d(planes, planes, midplanes(planes, planes)),
                tnn.BatchNorm3d(planes))
            self.relu = tnn.ReLU(inplace=True)
            self.downsample = None
            if stride != 1 or inp != planes:
                self.downsample = tnn.Sequential(
                    tnn.Conv3d(inp, planes, 1,
                               stride=(stride, stride, stride), bias=False),
                    tnn.BatchNorm3d(planes))

        def forward(self, x):
            identity = x if self.downsample is None else self.downsample(x)
            return self.relu(self.conv2(self.conv1(x)) + identity)

    class VideoResNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.stem = tnn.Sequential(
                tnn.Conv3d(3, 45, (1, 7, 7), stride=(1, 2, 2),
                           padding=(0, 3, 3), bias=False),
                tnn.BatchNorm3d(45), tnn.ReLU(inplace=True),
                tnn.Conv3d(45, 64, (3, 1, 1), padding=(1, 0, 0),
                           bias=False),
                tnn.BatchNorm3d(64), tnn.ReLU(inplace=True))
            self.layer1 = tnn.Sequential(BasicBlock(64, 64),
                                         BasicBlock(64, 64))
            self.layer2 = tnn.Sequential(BasicBlock(64, 128, 2),
                                         BasicBlock(128, 128))
            self.layer3 = tnn.Sequential(BasicBlock(128, 256, 2),
                                         BasicBlock(256, 256))
            self.layer4 = tnn.Sequential(BasicBlock(256, 512, 2),
                                         BasicBlock(512, 512))
            self.fc = tnn.Linear(512, num_classes)

        def forward(self, x):
            h = self.stem(x)
            for layer in (self.layer1, self.layer2, self.layer3,
                          self.layer4):
                h = layer(h)
            h = h.mean(dim=(2, 3, 4))
            return self.fc(h)

    return VideoResNet()


def test_r2plus1d_torch_import_parity():
    """Random torch r2plus1d_18 → import_torch_state_dict → flax forward
    matches the torch forward (eval mode, running stats exercised)."""
    torch = pytest.importorskip("torch")
    from paddlerobotics_tpu.hri.r2plus1d import import_torch_state_dict

    torch.manual_seed(0)
    tm = _torch_r2plus1d_18(num_classes=5)
    # randomize BN affine + running stats so the import is non-trivial
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm3d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.3, 0.3)
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    tm.eval()

    x = np.random.RandomState(1).rand(1, 8, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()

    variables = import_torch_state_dict(tm.state_dict())
    model = R2Plus1D18(num_classes=5)
    got = np.asarray(model.apply(variables, jnp.asarray(x), False))

    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_r2plus1d_state_dict_key_manifest():
    """Full-fidelity manifest (VERDICT r2 #7, 4th importer): the torch
    fixture's state_dict keys must equal the published torchvision
    VideoResNet('r2plus1d_18') schema, derived BY HAND from its module
    structure (torchvision.models.video.resnet): stem =
    Sequential(Conv3d, BN, ReLU, Conv3d, BN, ReLU); each BasicBlock's
    convN = Sequential(Conv2Plus1D(=Sequential(Conv3d, BN, ReLU,
    Conv3d)), BN, ReLU); downsample = Sequential(Conv3d, BN) on the
    first block of layers 2-4; all convs bias-free; fc with bias. An
    ig65m/kinetics checkpoint carries exactly these keys, so
    import_torch_state_dict consuming this manifest end-to-end is the
    real-file load path minus only the values (zero-egress)."""
    torch = pytest.importorskip("torch")

    def bn_keys(p):
        return {f"{p}.weight", f"{p}.bias", f"{p}.running_mean",
                f"{p}.running_var", f"{p}.num_batches_tracked"}

    expected = {"stem.0.weight", "stem.3.weight", "fc.weight", "fc.bias"}
    expected |= bn_keys("stem.1") | bn_keys("stem.4")
    for L in range(1, 5):
        for i in range(2):
            b = f"layer{L}.{i}"
            for cv in ("conv1", "conv2"):
                expected |= {f"{b}.{cv}.0.0.weight",
                             f"{b}.{cv}.0.3.weight"}
                expected |= bn_keys(f"{b}.{cv}.0.1")
                expected |= bn_keys(f"{b}.{cv}.1")
        if L > 1:
            expected |= {f"layer{L}.0.downsample.0.weight"}
            expected |= bn_keys(f"layer{L}.0.downsample.1")

    tm = _torch_r2plus1d_18(num_classes=5)
    assert set(tm.state_dict().keys()) == expected
