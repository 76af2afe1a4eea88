"""Avatar renderer: composite semantics of HRI/TFVT_HRI/avatar/avatar.py
(expression timeline, caption, movement overlay, render cache) executed
end-to-end on synthesized assets — no moviepy, pure numpy/cv2."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from paddlerobotics_tpu.hri.avatar import (EXP_POS, MOVE_Y, RobotAvatar,
                                           get_macro_act_key)

FPS = 10
W, H = 640, 720


def _write_clip(path, n_frames, color, size):
    w, h = size
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), FPS, (w, h))
    assert vw.isOpened()
    frame = np.zeros((h, w, 3), np.uint8)
    frame[:] = color[::-1]  # BGR
    for _ in range(n_frames):
        vw.write(frame)
    vw.release()


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    root = tmp_path_factory.mktemp("avatar_assets")
    for d in ("action", "expression", "movement"):
        os.makedirs(root / d)
    # 1 s base action, dark gray; expressions solid R/G so the overlay
    # region identifies which segment is playing at any t
    _write_clip(str(root / "action" / "null.avi"), FPS, (40, 40, 40),
                (W, H))
    _write_clip(str(root / "expression" / "null.avi"), FPS,
                (0, 0, 200), (336, 336))
    _write_clip(str(root / "expression" / "smile.avi"), 4,
                (200, 0, 0), (336, 336))
    png = np.zeros((40, 200, 4), np.uint8)
    png[..., 1] = 255   # green, fully opaque
    png[..., 3] = 255
    cv2.imwrite(str(root / "movement" / "forward.png"), png)
    return str(root)


def _read_frames(path):
    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, img = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    cap.release()
    return frames


def _exp_patch(frame):
    x, y = EXP_POS
    return frame[y + 60:y + 100, x + 60:x + 100].reshape(-1, 3).mean(0)


def test_render_timeline(assets, tmp_path):
    av = RobotAvatar(assets)
    assert av.available
    out = str(tmp_path / "out.avi")
    av.render("hello there", "null", "smile", "forward", out,
              dft_exp_dt=0.2)
    frames = _read_frames(out)
    # duration = action clip duration (avatar.py:103)
    assert len(frames) == FPS

    # t=0 (< dft_exp_dt): null expression (blue-ish) in the slot
    m0 = _exp_patch(frames[0])
    assert m0[2] > 120 and m0[0] < 80, m0
    # t=0.5 s: inside the 0.4 s smile segment start=0.2 → red
    m5 = _exp_patch(frames[5])
    assert m5[0] > 120 and m5[2] < 80, m5
    # t=0.9 s: past 0.2+0.4 → back to null (blue)
    m9 = _exp_patch(frames[9])
    assert m9[2] > 120 and m9[0] < 80, m9

    # caption: green pixels in the top band
    top = frames[0][:120].reshape(-1, 3).astype(int)
    assert ((top[:, 1] > 150) & (top[:, 0] < 100)).any()

    # movement strip: pure-green row centered at MOVE_Y
    strip = frames[0][MOVE_Y + 10, W // 2]
    assert strip[1] > 150 and strip[0] < 80 and strip[2] < 80


def test_render_no_talk_no_move(assets, tmp_path):
    av = RobotAvatar(assets)
    out = str(tmp_path / "plain.avi")
    av.render("", "null", "null", "null", out)
    frames = _read_frames(out)
    assert len(frames) == FPS
    # no caption → top band stays the base gray (no green text)
    top = frames[0][:40].reshape(-1, 3).astype(int)
    assert not ((top[:, 1] > 150) & (top[:, 0] < 100)).any()


def test_render_cache(assets, tmp_path):
    cache = str(tmp_path / "cache")
    os.makedirs(cache)
    av = RobotAvatar(assets, cache_dir=cache)
    out1 = str(tmp_path / "a.avi")
    av.render("hi", "null", "smile", "null", out1)
    key = get_macro_act_key("hi", "null", "smile", "null")
    cached = os.path.join(cache, key + ".avi")
    assert os.path.exists(cached)
    # second render is served from the cache byte-for-byte
    out2 = str(tmp_path / "b.avi")
    av.render("hi", "null", "smile", "null", out2)
    with open(out2, "rb") as f2, open(cached, "rb") as fc:
        assert f2.read() == fc.read()
    # distinct macro actions get distinct keys
    assert key != get_macro_act_key("hi", "null", "null", "null")
