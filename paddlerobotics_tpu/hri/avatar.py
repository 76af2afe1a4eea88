"""Robot avatar renderer (rebuild of HRI/TFVT_HRI/avatar/avatar.py).

Composes action/expression/talk/movement clips into a rendered response
video via moviepy when available (the reference hard-depends on it;
here it is gated so headless training images work), with an asset cache.
"""

from __future__ import annotations

import os
from typing import Dict, Optional


class RobotAvatar:
    """Clip compositor with lazy asset cache (avatar.py:62-103)."""

    def __init__(self, asset_dir: str, size=(480, 480)):
        self.asset_dir = asset_dir
        self.size = size
        self._cache: Dict[str, object] = {}
        try:
            import moviepy.editor as mpy  # noqa: F401

            self._mpy = mpy
        except Exception:
            self._mpy = None

    @property
    def available(self) -> bool:
        return self._mpy is not None

    def _clip(self, kind: str, name: str):
        key = f"{kind}/{name}"
        if key not in self._cache:
            path = os.path.join(self.asset_dir, kind, name + ".mp4")
            if not os.path.exists(path):
                return None
            self._cache[key] = self._mpy.VideoFileClip(path)
        return self._cache[key]

    def render(self, act: str = "null", exp: str = "null",
               utterance: str = "", movement: str = "null",
               out_path: Optional[str] = None):
        """Composite (expression over action base, movement side strip,
        utterance as subtitle) → video file path."""
        if not self.available:
            raise RuntimeError(
                "moviepy is not installed; avatar rendering is disabled")
        mpy = self._mpy
        clips = []
        base = self._clip("action", act) or self._clip("action", "null")
        if base is not None:
            clips.append(base.resize(self.size))
        face = self._clip("expression", exp)
        if face is not None:
            clips.append(face.resize((self.size[0] // 3,
                                      self.size[1] // 3)).set_position(
                ("right", "top")))
        if not clips:
            raise FileNotFoundError("no avatar assets found")
        video = mpy.CompositeVideoClip(clips, size=self.size)
        if utterance:
            txt = mpy.TextClip(utterance, fontsize=24, color="white")
            txt = txt.set_position(("center", "bottom")).set_duration(
                video.duration)
            video = mpy.CompositeVideoClip([video, txt], size=self.size)
        if out_path:
            video.write_videofile(out_path, fps=24, logger=None)
        return video
