"""Procedural proactive-greeting scenes with LEARNABLE labels.

The reference trains its attention controller on annotated XiaoduHi
videos (interaction/common/data.py) that cannot exist in this
environment. `train_attention.synthetic_batch` only smoke-tests shapes —
its labels are independent of the tokens, so nothing converges. This
module generates token-level scenes whose labels are a deterministic
function of MULTI-FRAME token content, so fitting them requires the
model to genuinely integrate appearance, position, and motion across
the window:

- A window holds F frames × K token slots. 0–3 "person" actors move
  through the camera field on per-window trajectories (approach /
  leave / pass-by / loiter); remaining slots are background clutter or
  padding.
- A frame TRIGGERS (has_act=1) iff some actor is NEAR FIELD (apparent
  bbox height over a threshold — the infer_v3.cpp:274-284 near-field
  business rule) AND APPROACHING (bbox grew over preceding frames —
  only recoverable by temporal attention) AND FACING the camera (an
  appearance attribute direction).
- `is_obj` marks the triggering actor's token slot on triggering
  frames (the obj_cls head's target, attention_ctrl.py:408-432).
- `act_ids` on triggering frames derive from the actor's salutation
  band (child/adult/elder — SalutationClsTree semantics,
  interaction/salutation_cls.py) × approach speed; null action 0
  otherwise.

Tokens reuse the REAL serving-layout pieces: visual tokens are
[512-d appearance | 50-d sin bbox pos-emb] exactly like the scene
sensor's 562-d tokens (perception/scene.py; pos-emb from
hri/utils.get_bbox_pos_emb), and the inst_crop variant emits the
(1280-d crop feat, 80-d cls scores, 50-d pos-emb) triple.
"""

from __future__ import annotations

import numpy as np

IM = 416.0              # letterboxed frame size (infer_v3.cpp:189-228)
NEAR_H = 170.0          # near-field apparent-height threshold (px)
GROW = 6.0              # min bbox-height growth (px over 2 frames)
FAST = 16.0             # fast-approach growth → distinct action id
BANDS = 3               # salutation bands (child / adult / elder)
NULL_ACT = 0

# action-id layout: 1 + band*2 + fast  ∈ [1, 6]
NUM_ACTIONS_MIN = 1 + BANDS * 2


def _unit(rng, d):
    v = rng.randn(d).astype(np.float32)
    return v / np.linalg.norm(v)


class ScenePrototypes:
    """Fixed random directions shared by generator draws (seeded)."""

    def __init__(self, appearance_dim: int, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.person = _unit(rng, appearance_dim)
        self.facing = _unit(rng, appearance_dim)
        self.bands = [_unit(rng, appearance_dim) for _ in range(BANDS)]
        self.clutter = [_unit(rng, appearance_dim) for _ in range(8)]


def _pos_emb_np(bbox: np.ndarray) -> np.ndarray:
    """50-d sin pos-emb, numpy mirror of hri/utils.get_bbox_pos_emb
    (same formula; kept in numpy so generation never touches the
    device)."""
    xmin, ymin, xmax, ymax = bbox
    sx = lambda v: (v - IM / 2) / (IM / 2) * (np.pi / 2)
    sy = lambda v: (v - IM / 2) / (IM / 2) * (np.pi / 2)
    tx = np.linspace(0.0, 1.0, 5)
    x_pos = np.sin(sx(xmin) + (sx(xmax) - sx(xmin)) * tx)
    y_pos = np.sin(sy(ymin) + (sy(ymax) - sy(ymin)) * tx)
    x_emb = np.broadcast_to(x_pos[None, :], (5, 5))
    y_emb = np.broadcast_to(y_pos[:, None], (5, 5))
    return np.stack([y_emb, x_emb]).reshape(-1).astype(np.float32)


def _actor_track(rng, F: int):
    """One actor's bbox height/center trajectory + attributes."""
    kind = rng.choice(["approach", "leave", "pass", "loiter"],
                      p=[0.4, 0.2, 0.2, 0.2])
    h0 = rng.uniform(60.0, 150.0)
    if kind == "approach":
        rate = rng.uniform(4.0, 22.0)
    elif kind == "leave":
        rate = -rng.uniform(4.0, 14.0)
    else:
        rate = rng.uniform(-1.5, 1.5)
    heights = h0 + rate * np.arange(F) + rng.randn(F) * 1.0
    heights = np.clip(heights, 24.0, 380.0)
    cx = rng.uniform(80.0, IM - 80.0)
    vx = rng.uniform(-14.0, 14.0) if kind == "pass" else rng.uniform(-4, 4)
    cxs = np.clip(cx + vx * np.arange(F) + rng.randn(F), 10.0, IM - 10.0)
    return {"heights": heights, "cxs": cxs,
            "facing": bool(rng.rand() < 0.7),
            "band": int(rng.randint(BANDS))}


def generate_windows(rng: np.random.RandomState, n: int, ctrl_cfg,
                     protos: ScenePrototypes | None = None) -> dict:
    """n training windows shaped for ctrl_cfg.inputs_type.

    Returns the trainer batch dict (leading axis n). All arrays numpy;
    callers jnp.asarray / shard as needed.
    """
    F, K = ctrl_cfg.num_frames, ctrl_cfg.tokens_per_frame
    crop = ctrl_cfg.inputs_type == "inst_crop"
    if ctrl_cfg.inputs_type not in ("visual_token", "inst_crop"):
        raise ValueError(
            f"synthetic scenes support visual_token / inst_crop, got "
            f"{ctrl_cfg.inputs_type!r}")
    app_dim = 1280 if crop else 512
    protos = protos or ScenePrototypes(app_dim)
    T = F * K

    toks = np.zeros((n, T, app_dim), np.float32)
    cls = np.zeros((n, T, ctrl_cfg.inst_cls_dim), np.float32)
    pos = np.zeros((n, T, 50), np.float32)
    pad = np.zeros((n, T), np.float32)
    has_act = np.zeros((n, F), np.float32)
    is_obj = np.zeros((n, T), np.float32)
    act_ids = np.zeros((n, F), np.int64)

    for w in range(n):
        n_act = rng.randint(0, 4)
        actors = [_actor_track(rng, F) for _ in range(n_act)]
        n_clut = rng.randint(1, 6)
        for t in range(F):
            slot = 0
            for a in actors:
                i = t * K + slot
                h = a["heights"][t]
                wd = h * 0.45
                bbox = np.array([a["cxs"][t] - wd / 2, IM - 40 - h,
                                 a["cxs"][t] + wd / 2, IM - 40.0])
                app = (protos.person + 0.6 * protos.bands[a["band"]]
                       + (0.6 * protos.facing if a["facing"] else 0.0)
                       + 0.25 * rng.randn(app_dim)).astype(np.float32)
                toks[w, i, :] = app
                cls[w, i, 0] = 1.0 + 0.1 * rng.randn()   # person score
                pos[w, i] = _pos_emb_np(bbox)
                pad[w, i] = 1.0
                grow = (a["heights"][t] - a["heights"][max(t - 2, 0)]
                        if t >= 2 else 0.0)
                near = h >= NEAR_H
                if near and grow >= GROW and a["facing"]:
                    has_act[w, t] = 1.0
                    is_obj[w, i] = 1.0
                    act_ids[w, t] = 1 + a["band"] * 2 + (grow >= FAST)
                slot += 1
            for c in range(n_clut):
                if slot >= K:
                    break
                i = t * K + slot
                proto = protos.clutter[c % len(protos.clutter)]
                toks[w, i] = proto + 0.25 * rng.randn(app_dim)
                ccls = 1 + rng.randint(ctrl_cfg.inst_cls_dim - 1)
                cls[w, i, ccls] = 1.0
                cb = np.sort(rng.uniform(0, IM, 2))
                pos[w, i] = _pos_emb_np(
                    np.array([cb[0], cb[0], cb[1], cb[1]]))
                pad[w, i] = 1.0
                slot += 1

    frame_ids = np.tile(np.repeat(np.arange(1, F + 1), K), (n, 1))
    batch = {"frame_ids": frame_ids.astype(np.int64),
             "padding_mask": pad, "has_act": has_act,
             "act_ids": act_ids, "is_obj": is_obj}
    if crop:
        batch["inst_crop_feat"] = toks
        batch["inst_cls"] = cls
        batch["inst_pos_emb"] = pos
    else:
        # 562-d serving token layout: [512 appearance | 50 pos-emb]
        batch["visual_tokens"] = np.concatenate([toks, pos], axis=-1)
    return batch
