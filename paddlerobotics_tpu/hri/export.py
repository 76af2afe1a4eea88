"""Deployable inference bundle for the HRI serving stack.

Rebuild of scripts/save_infer_model_params.py (reference: collects the
detector + visual-tokenizer + attention-controller fluid programs into
one inference-model directory consumed by the C++/Python servers). Here
the bundle is a directory:

    manifest.json        model/config metadata (AttnCtrlConfig fields,
                         scene-sensor geometry, thresholds)
    ctrl_params.msgpack  attention-controller flax params
    scene_params.msgpack scene-sensor (YOLO) flax params (optional)
    wae.npy              multimodal action embedding table (optional)

`load_bundle` returns everything `hri.serving.ProactiveGreetingService`
(and the runtime_cpp ctypes bridge, which receives params from Python)
needs to serve.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import numpy as np
from flax import serialization

from paddlerobotics_tpu.hri.attention_ctrl import AttnCtrlConfig

MANIFEST = "manifest.json"
CTRL_PARAMS = "ctrl_params.msgpack"
SCENE_PARAMS = "scene_params.msgpack"
WAE = "wae.npy"


def save_bundle(path: str, ctrl_cfg: AttnCtrlConfig, ctrl_params,
                scene_params=None, wae: Optional[np.ndarray] = None,
                scene_meta: Optional[dict] = None,
                extra: Optional[dict] = None) -> None:
    os.makedirs(path, exist_ok=True)
    manifest = {
        "format": "paddlerobotics_tpu.hri.bundle.v1",
        "ctrl_cfg": dataclasses.asdict(ctrl_cfg),
        "scene": scene_meta or {},
        "extra": extra or {},
        "has_scene_params": scene_params is not None,
        "has_wae": wae is not None,
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    with open(os.path.join(path, CTRL_PARAMS), "wb") as f:
        f.write(serialization.to_bytes(ctrl_params))
    if scene_params is not None:
        with open(os.path.join(path, SCENE_PARAMS), "wb") as f:
            f.write(serialization.to_bytes(scene_params))
    if wae is not None:
        np.save(os.path.join(path, WAE), np.asarray(wae))


def load_bundle(path: str, ctrl_params_template,
                scene_params_template=None):
    """Load a bundle. Templates supply the PyTree structure (msgpack
    stores leaves only). Returns (manifest, ctrl_cfg, ctrl_params,
    scene_params|None, wae|None)."""
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    ctrl_cfg = AttnCtrlConfig(**manifest["ctrl_cfg"])
    with open(os.path.join(path, CTRL_PARAMS), "rb") as f:
        ctrl_params = serialization.from_bytes(ctrl_params_template,
                                               f.read())
    scene_params = None
    if manifest["has_scene_params"]:
        if scene_params_template is None:
            raise ValueError("bundle has scene params; pass a template")
        with open(os.path.join(path, SCENE_PARAMS), "rb") as f:
            scene_params = serialization.from_bytes(
                scene_params_template, f.read())
    wae = None
    if manifest["has_wae"]:
        wae = np.load(os.path.join(path, WAE))
    return manifest, ctrl_cfg, ctrl_params, scene_params, wae
