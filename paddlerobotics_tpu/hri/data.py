"""Dataset pipeline for attention-controller training.

Rebuild of HRI/TFVT_HRI/interaction/common/data.py (XiaoduHiDataset
annotation parsing + train/test split, data.py:28-88; DataWorkerV2 /
XiaoduHiDataloaderv2 multiprocessing workers each owning a YOLOv4,
data.py:244-888) and data_via_decord.py's split detector/post workers.

TPU-native restructure: the detector runs *on device* inside a jitted
tokenize function over batched frames, so the host side shrinks to video
decode + window sampling + a small prefetch thread — the reference's
fleet of GPU-owning processes collapses into one accelerator program.

Sample layout matches attention_ctrl's feeds: visual_tokens
(F·K, 562), frame_ids, padding_mask, act_ids (F,), has_act (F,),
is_obj (F·K,).
"""

from __future__ import annotations

import dataclasses
import json
import os
import queue
import threading
from typing import Iterator, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class AnnotatedMoment:
    """One annotated trigger moment in a video (anno txt line)."""

    video: str
    frame: int
    act_id: int
    target_bbox: Optional[List[float]] = None


def parse_annotation_file(path: str) -> List[AnnotatedMoment]:
    """Parse the reference's anno txt (data.py:28-60): lines of
    `video_path frame_idx act_id [x0 y0 x1 y1]`."""
    out = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) < 3:
                continue
            bbox = [float(v) for v in parts[3:7]] if len(parts) >= 7 else None
            out.append(AnnotatedMoment(parts[0], int(parts[1]),
                                       int(parts[2]), bbox))
    return out


class XiaoduHiDataset:
    """Annotation container with deterministic train/test split
    (data.py:62-88 pkl semantics, json instead of pickle)."""

    def __init__(self, moments: Sequence[AnnotatedMoment],
                 test_frac: float = 0.1, seed: int = 0):
        rng = np.random.RandomState(seed)
        idx = rng.permutation(len(moments))
        n_test = int(len(moments) * test_frac)
        self.test = [moments[i] for i in idx[:n_test]]
        self.train = [moments[i] for i in idx[n_test:]]

    def save(self, path: str):
        def ser(ms):
            return [dataclasses.asdict(m) for m in ms]

        with open(path, "w") as f:
            json.dump({"train": ser(self.train), "test": ser(self.test)}, f)

    @staticmethod
    def load(path: str) -> "XiaoduHiDataset":
        with open(path) as f:
            d = json.load(f)
        ds = XiaoduHiDataset([], 0.0)
        ds.train = [AnnotatedMoment(**m) for m in d["train"]]
        ds.test = [AnnotatedMoment(**m) for m in d["test"]]
        return ds


def read_video_frames(path: str, indices: Sequence[int],
                      size: int = 416) -> np.ndarray:
    """Decode specific frames → (N,size,size,3) in [0,1], letterboxed.
    cv2-based (the reference uses decord/cv2); raises if unavailable."""
    import cv2

    from paddlerobotics_tpu.hri.utils import letterbox_image

    cap = cv2.VideoCapture(path)
    frames = []
    for i in indices:
        cap.set(cv2.CAP_PROP_POS_FRAMES, i)
        ok, img = cap.read()
        if not ok:
            img = np.zeros((size, size, 3), np.uint8)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        frames.append(letterbox_image(img, size))
    cap.release()
    return np.stack(frames)


class WindowSampler:
    """Pos/neg training-window sampler (data.py:244-500 semantics).

    Positive: the `num_frames` window ending at an annotated moment, with
    has_act=1 and act_id at the final frame. Negative: windows away from
    any annotation (plus externally mined full negatives from deployment
    logs — the reference's `full_neg` txt, train_attention_controller
    .py:51-55 — appended via `add_negatives`).
    """

    def __init__(self, dataset: Sequence[AnnotatedMoment],
                 num_frames: int = 10, neg_ratio: float = 1.0, seed: int = 0):
        self.moments = list(dataset)
        self.num_frames = num_frames
        self.neg_ratio = neg_ratio
        self.rng = np.random.RandomState(seed)
        self.extra_negatives: List[AnnotatedMoment] = []

    def add_negatives(self, moments: Sequence[AnnotatedMoment]):
        self.extra_negatives.extend(moments)

    def sample(self) -> tuple:
        """→ (video, frame_indices, act_id, is_positive)."""
        pool_neg = self.extra_negatives
        p_neg = self.neg_ratio / (1.0 + self.neg_ratio)
        if pool_neg and self.rng.rand() < p_neg:
            m = pool_neg[self.rng.randint(len(pool_neg))]
            positive = False
            act_id = 0
        else:
            m = self.moments[self.rng.randint(len(self.moments))]
            positive = True
            act_id = m.act_id
        end = max(m.frame, self.num_frames - 1)
        if not positive:
            end += self.rng.randint(0, 50)
        frames = list(range(end - self.num_frames + 1, end + 1))
        return m.video, frames, act_id, positive


class PrefetchLoader:
    """Background-thread prefetcher: host decode feeding a device
    tokenize function (replaces the reference's mp worker fleet)."""

    def __init__(self, sample_fn, tokenize_fn, batch_size: int,
                 prefetch: int = 4):
        self.sample_fn = sample_fn
        self.tokenize_fn = tokenize_fn
        self.batch_size = batch_size
        self.q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while not self._stop.is_set():
            try:
                batch = [self.sample_fn() for _ in range(self.batch_size)]
                self.q.put(self.tokenize_fn(batch), timeout=5)
            except queue.Full:
                continue
            except Exception:
                break

    def __iter__(self) -> Iterator:
        while True:
            yield self.q.get()

    def close(self):
        self._stop.set()


def assemble_training_sample(tokens: np.ndarray, valid: np.ndarray,
                             act_id: int, positive: bool,
                             target_token: Optional[int] = None):
    """Per-window feeds for the controller (data.py token assembly).

    tokens (F,K,562), valid (F,K) → dict of flat arrays.
    """
    F, K, D = tokens.shape
    frame_ids = np.repeat(np.arange(1, F + 1), K)
    padding = valid.reshape(-1).astype(np.float32)
    has_act = np.zeros(F, np.float32)
    act_ids = np.zeros(F, np.int64)
    is_obj = np.zeros(F * K, np.float32)
    if positive:
        has_act[-1] = 1.0
        act_ids[-1] = act_id
        if target_token is not None:
            is_obj[(F - 1) * K + target_token] = 1.0
    return {
        "visual_tokens": tokens.reshape(F * K, D),
        "frame_ids": frame_ids,
        "padding_mask": padding,
        "has_act": has_act,
        "act_ids": act_ids,
        "is_obj": is_obj,
    }
