"""Video IO roundtrip + data-pipeline decode (cv2-gated)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from paddlerobotics_tpu.hri import video as video_mod
from paddlerobotics_tpu.hri import data as data_mod


@pytest.fixture(scope="module")
def sample_video(tmp_path_factory):
    """Write a 30-frame gradient video."""
    path = str(tmp_path_factory.mktemp("vid") / "sample.mp4")
    w = video_mod.VideoWriter(path, fps=30)
    for i in range(30):
        frame = np.full((120, 160, 3), i * 8, np.uint8)
        frame[:, :, 0] = 255 - i * 8
        w.write(frame)
    w.close()
    return path


def test_video_writer_and_clip_decode(sample_video):
    frames = video_mod.clip_video_to_frames(sample_video, start=0.0,
                                            end=0.5, stride=1)
    assert len(frames) >= 10
    assert frames[0].shape == (120, 160, 3)
    # brightness increases over time (channel 1 ramps up)
    assert frames[-1][:, :, 1].mean() > frames[0][:, :, 1].mean()


def test_read_video_frames_letterboxed(sample_video):
    out = data_mod.read_video_frames(sample_video, [0, 5, 10], size=416)
    assert out.shape == (3, 416, 416, 3)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_draw_instances(sample_video):
    frames = video_mod.clip_video_to_frames(sample_video, end=0.1)
    out = video_mod.draw_instances(frames[0], [[10, 10, 80, 100]],
                                   labels=["person"], scores=[0.9])
    assert out.shape == frames[0].shape
    assert not np.array_equal(out, frames[0])


def test_prefetch_loader():
    import time

    def sample():
        return np.ones(3)

    def tokenize(batch):
        return np.stack(batch)

    loader = data_mod.PrefetchLoader(sample, tokenize, batch_size=4,
                                     prefetch=2)
    it = iter(loader)
    batch = next(it)
    assert batch.shape == (4, 3)
    loader.close()
