"""R(2+1)D baseline: dataset, trainer, eval sweep, inference program.

Completes the reference's baselines/r2plus1d stack (dataset.py:1-240
FramesDataset, train.py:1-96 fit entry, program.py:1-99 inference
program with temperature softmax + null-excluding top-k sampling) around
the flax R2Plus1D18 model (hri/r2plus1d.py):

- `ClipDataset`: positive annotated moments labeled by Scenario or
  WAE_id plus full-negative clips labeled as the null class — the
  FramesDataset split-file semantics (dataset.py:110-160) with clip
  loading injected as a callable (decord/cv2 host-side in production,
  synthetic arrays in tests).
- `R2Plus1DTrainer`: jitted softmax-CE training step (Adam) with
  BatchNorm state, epoch loop, accuracy eval — the utils_cv
  `learner.fit` counterpart.
- `precision_recall_sweep`: the trigger-threshold sweep the reference
  runs through its C++ eval servers (jetson/parallel_eval.py:26-543) —
  P(non-null) vs threshold → (threshold, precision, recall) rows.
- `make_inference_fn`: program.py equivalent — logits/temperature →
  softmax probs + top-k sample over NON-null actions
  (program.py:44-66), jitted.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from paddlerobotics_tpu.hri.r2plus1d import R2Plus1D18


@dataclasses.dataclass
class ClipAnno:
    """One positive annotated moment (dataset.py pos_anno_lst rows)."""

    video: str
    time_ms: int
    scenario_id: int = 0
    wae_id: int = 0


class ClipDataset:
    """FramesDataset-equivalent clip dataset.

    group_by selects the label space (dataset.py:71-77): 'Scenario' →
    scenario_id, 'WAE_id' → wae_id. Full negatives (deployment-mined
    clips with no interaction) get label 0 — the null class
    (dataset.py:121-140).
    """

    def __init__(self, annos: Sequence[ClipAnno],
                 full_neg: Sequence[str],
                 load_clip: Callable[[str, int], np.ndarray],
                 num_classes: int,
                 group_by: str = "WAE_id",
                 sample_length: int = 8,
                 test_frac: float = 0.2, seed: int = 0):
        assert group_by in ("Scenario", "WAE_id")
        self.load_clip = load_clip
        self.sample_length = sample_length
        self.num_classes = num_classes
        rows: List[Tuple[str, int, int]] = []
        for a in annos:
            label = a.scenario_id if group_by == "Scenario" else a.wae_id
            rows.append((a.video, a.time_ms, int(label)))
        for path in full_neg:
            rows.append((path, 0, 0))
        rng = np.random.RandomState(seed)
        idx = rng.permutation(len(rows))
        n_test = int(len(rows) * test_frac)
        self.test = [rows[i] for i in idx[:n_test]]
        self.train = [rows[i] for i in idx[n_test:]]
        self.rng = rng

    def _clip(self, row) -> Tuple[np.ndarray, int]:
        video, t, label = row
        clip = self.load_clip(video, t)
        assert clip.shape[0] == self.sample_length, clip.shape
        return clip.astype(np.float32), label

    def batches(self, split: str, batch_size: int):
        rows = self.train if split == "train" else self.test
        order = self.rng.permutation(len(rows)) if split == "train" \
            else np.arange(len(rows))
        for i in range(0, len(rows) - batch_size + 1, batch_size):
            batch = [self._clip(rows[j]) for j in order[i:i + batch_size]]
            clips = np.stack([b[0] for b in batch])
            labels = np.asarray([b[1] for b in batch], np.int32)
            yield clips, labels


class R2Plus1DTrainer:
    def __init__(self, num_classes: int, lr: float = 1e-4, seed: int = 0,
                 input_hw: int = 112, sample_length: int = 8,
                 blocks=None, stem_kernel: int = 7):
        kw = {} if blocks is None else {"blocks": tuple(blocks)}
        self.model = R2Plus1D18(num_classes=num_classes,
                                stem_kernel=stem_kernel, **kw)
        self.tx = optax.adam(lr)
        dummy = jnp.zeros((1, sample_length, input_hw, input_hw, 3))
        variables = self.model.init(jax.random.key(seed), dummy, True)
        self.params = variables["params"]
        self.batch_stats = variables["batch_stats"]
        self.opt_state = self.tx.init(self.params)

        def train_step(params, batch_stats, opt_state, clips, labels):
            def loss_fn(p):
                logits, updates = self.model.apply(
                    {"params": p, "batch_stats": batch_stats}, clips, True,
                    mutable=["batch_stats"])
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels).mean()
                return ce, (updates["batch_stats"], logits)

            (loss, (bs, logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            upd, opt_state = self.tx.update(grads, opt_state)
            params = optax.apply_updates(params, upd)
            acc = jnp.mean(jnp.argmax(logits, -1) == labels)
            return params, bs, opt_state, loss, acc

        self._train_step = jax.jit(train_step)

        def eval_logits(params, batch_stats, clips):
            return self.model.apply(
                {"params": params, "batch_stats": batch_stats}, clips,
                False)

        self._eval_logits = jax.jit(eval_logits)

    def fit(self, data: ClipDataset, epochs: int = 10, batch_size: int = 8,
            log: Optional[Callable[[str], None]] = None) -> Dict[str, float]:
        hist = {}
        for ep in range(epochs):
            losses, accs = [], []
            for clips, labels in data.batches("train", batch_size):
                (self.params, self.batch_stats, self.opt_state, loss,
                 acc) = self._train_step(self.params, self.batch_stats,
                                         self.opt_state, clips, labels)
                losses.append(float(loss))
                accs.append(float(acc))
            hist = {"loss": float(np.mean(losses)),
                    "acc": float(np.mean(accs)), "epoch": ep}
            if log:
                log(f"epoch {ep}: loss {hist['loss']:.4f} "
                    f"acc {hist['acc']:.3f}")
        return hist

    def predict_probs(self, clips: np.ndarray) -> np.ndarray:
        logits = self._eval_logits(self.params, self.batch_stats, clips)
        return np.asarray(jax.nn.softmax(logits, -1))

    def evaluate(self, data: ClipDataset, batch_size: int = 8
                 ) -> Dict[str, float]:
        correct = total = 0
        probs_all, labels_all = [], []
        for clips, labels in data.batches("test", batch_size):
            probs = self.predict_probs(clips)
            correct += int((probs.argmax(-1) == labels).sum())
            total += len(labels)
            probs_all.append(probs)
            labels_all.append(labels)
        probs = np.concatenate(probs_all) if probs_all else np.zeros((0, 1))
        labels = np.concatenate(labels_all) if labels_all else np.zeros(0)
        return {"accuracy": correct / max(total, 1),
                "probs": probs, "labels": labels}


def precision_recall_sweep(probs: np.ndarray, labels: np.ndarray,
                           thresholds: Sequence[float] = tuple(
                               np.round(np.arange(0.05, 1.0, 0.05), 2)),
                           null_id: int = 0) -> List[Dict[str, float]]:
    """Trigger P/R sweep (parallel_eval.py threshold sweeps): predict
    'interaction' when P(non-null) = 1 − P(null) ≥ threshold."""
    p_trigger = 1.0 - probs[:, null_id]
    is_pos = labels != null_id
    rows = []
    for th in thresholds:
        pred = p_trigger >= th
        tp = int(np.sum(pred & is_pos))
        fp = int(np.sum(pred & ~is_pos))
        fn = int(np.sum(~pred & is_pos))
        rows.append({
            "threshold": float(th),
            "precision": tp / max(tp + fp, 1),
            "recall": tp / max(tp + fn, 1),
        })
    return rows


def make_inference_fn(model: R2Plus1D18, null_act_idx: int = 0):
    """program.py equivalent: (variables, clip, temperature, top_k, rng)
    → (probs over all classes, sampled NON-null action id).

    Mirrors R2plus1DProgram._top_k_sampling (program.py:44-66): null
    action masked to −1e10, probabilities renormalized over the top-k,
    categorical sample.
    """

    def infer(variables, clip, temperature, top_k: int, rng):
        logits = model.apply(variables, clip, False) / temperature
        probs = jax.nn.softmax(logits, -1)
        n = logits.shape[-1]
        non_null = 1.0 - jax.nn.one_hot(null_act_idx, n)
        masked = logits * non_null - 1e10 * (1.0 - non_null)
        p = jax.nn.softmax(masked, -1)
        kth = jax.lax.top_k(p, top_k)[0][..., -1:]
        p_top = jnp.where(p >= kth, p, 0.0)
        p_top = p_top / jnp.sum(p_top, -1, keepdims=True)
        sample = jax.random.categorical(rng, jnp.log(p_top + 1e-20), -1)
        return probs, sample

    return jax.jit(infer, static_argnums=(3,))
