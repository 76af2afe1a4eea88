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

The INSTANCE family (`instance` + the three `without_*` ablations of
parallel_train_attn.py:25-31) emits the raw serving triple instead:
`inst_fm` (T,512,5,5) RoIAligned feature maps — appearance ⊗ a fixed
5×5 spatial profile + cell noise, so the 1×1-conv+fc reduction path
must recover the appearance direction —, `inst_cls` (T,80) detector
class scores, `inst_pos_emb` (T,50). Each `without_*` variant's batch
omits exactly the key the reference ablation drops, which removes the
corresponding label factor from the observable stream (e.g. the facing
attribute lives only in appearance, so `without_inst_fm` has a
sub-1.0 AUC ceiling by construction — the ablation's point).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

IM = 416.0              # letterboxed frame size (infer_v3.cpp:189-228)
NEAR_H = 170.0          # near-field apparent-height threshold (px)
GROW = 6.0              # min bbox-height growth (px over 2 frames)
FAST = 16.0             # fast-approach growth → distinct action id
BANDS = 3               # salutation bands (child / adult / elder)
NULL_ACT = 0

# action-id layout: 1 + band*2 + fast  ∈ [1, 6]
NUM_ACTIONS_MIN = 1 + BANDS * 2

INSTANCE_FAMILY = ("instance", "without_inst_fm", "without_inst_cls",
                   "without_inst_pos")

# fixed 5×5 spatial profile for synthetic RoIAligned feature maps —
# center-weighted like a pooled object response; shared by the numpy
# and device generators so their distributions match
_FM_W = np.array([0.5, 0.8, 1.0, 0.8, 0.5], np.float32)
FM_SPATIAL = np.outer(_FM_W, _FM_W)
FM_CELL_NOISE = 0.05


def variant_token_keys(inputs_type: str) -> tuple:
    """Token keys a variant's batch must carry (mirrors
    AttentionTrainer._variant_keys — attention_ctrl.py:86-119)."""
    if inputs_type == "visual_token":
        return ("visual_tokens",)
    if inputs_type == "inst_crop":
        return ("inst_crop_feat", "inst_cls", "inst_pos_emb")
    if inputs_type not in INSTANCE_FAMILY:
        raise ValueError(f"unknown inputs_type {inputs_type!r}")
    keys = []
    if inputs_type != "without_inst_fm":
        keys.append("inst_fm")
    if inputs_type != "without_inst_cls":
        keys.append("inst_cls")
    if inputs_type != "without_inst_pos":
        keys.append("inst_pos_emb")
    return tuple(keys)


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
    device). bbox (..., 4) xyxy → (..., 50)."""
    bbox = np.asarray(bbox, np.float32)
    xmin, ymin, xmax, ymax = (bbox[..., 0], bbox[..., 1],
                              bbox[..., 2], bbox[..., 3])
    s = lambda v: (v - IM / 2) / (IM / 2) * (np.pi / 2)
    tx = np.linspace(0.0, 1.0, 5, dtype=np.float32)
    x_pos = np.sin(s(xmin)[..., None] +
                   (s(xmax) - s(xmin))[..., None] * tx)     # (...,5)
    y_pos = np.sin(s(ymin)[..., None] +
                   (s(ymax) - s(ymin))[..., None] * tx)
    x_emb = np.broadcast_to(x_pos[..., None, :],
                            x_pos.shape[:-1] + (5, 5))
    y_emb = np.broadcast_to(y_pos[..., :, None],
                            y_pos.shape[:-1] + (5, 5))
    out = np.concatenate([y_emb.reshape(*y_emb.shape[:-2], 25),
                          x_emb.reshape(*x_emb.shape[:-2], 25)],
                         axis=-1)
    return out.astype(np.float32)


# Distribution-shift knobs (round-5 shift eval,
# scripts_dev/hri_shift_eval.py). Every key optional; defaults = the
# training distribution. The LABEL RULE (near-field ∧ approaching ∧
# facing) is computed from the shifted trajectories themselves, so
# labels stay consistent under every shift — only the input
# distribution moves.
DEFAULT_SHIFT = {
    "n_actors": (0, 3),     # actors per window (train: randint(0,4))
    "rate_scale": 1.0,      # approach/leave speed multiplier
    "h0_range": (60.0, 150.0),   # initial bbox height (size regime)
    "app_noise": 0.25,      # appearance jitter σ
    "app_drift": 0.0,       # fixed unseen appearance offset magnitude
    "facing_p": 0.7,        # P(actor faces camera) — trigger-rate shift
    "clutter": (1, 5),      # clutter tokens per window
}


def _actor_track(rng, F: int, shift: dict | None = None):
    """One actor's bbox height/center trajectory + attributes."""
    s = shift or DEFAULT_SHIFT
    kind = rng.choice(["approach", "leave", "pass", "loiter"],
                      p=[0.4, 0.2, 0.2, 0.2])
    h0 = rng.uniform(*s.get("h0_range", (60.0, 150.0)))
    rs = s.get("rate_scale", 1.0)
    if kind == "approach":
        rate = rng.uniform(4.0, 22.0) * rs
    elif kind == "leave":
        rate = -rng.uniform(4.0, 14.0) * rs
    else:
        rate = rng.uniform(-1.5, 1.5)
    heights = h0 + rate * np.arange(F) + rng.randn(F) * 1.0
    heights = np.clip(heights, 24.0, 380.0)
    cx = rng.uniform(80.0, IM - 80.0)
    vx = rng.uniform(-14.0, 14.0) if kind == "pass" else rng.uniform(-4, 4)
    cxs = np.clip(cx + vx * np.arange(F) + rng.randn(F), 10.0, IM - 10.0)
    return {"heights": heights, "cxs": cxs,
            "facing": bool(rng.rand() < s.get("facing_p", 0.7)),
            "band": int(rng.randint(BANDS))}


def alloc_buffers(n: int, ctrl_cfg) -> dict:
    """Preallocate one reusable output-batch buffer set.

    Fresh page-faulted writes are pathologically slow on some hosts
    (~150 µs/fault measured here), so steady-state generation must
    never allocate batch-sized arrays — pass the returned dict back to
    :func:`generate_windows` as ``out=`` to reuse it."""
    F, K = ctrl_cfg.num_frames, ctrl_cfg.tokens_per_frame
    keys = variant_token_keys(ctrl_cfg.inputs_type)
    T = F * K
    frame_ids = np.tile(np.repeat(np.arange(1, F + 1), K), (n, 1))
    out = {"frame_ids": frame_ids.astype(np.int64),
           "padding_mask": np.zeros((n, T), np.float32),
           "has_act": np.zeros((n, F), np.float32),
           "act_ids": np.zeros((n, F), np.int64),
           "is_obj": np.zeros((n, T), np.float32)}
    if ctrl_cfg.inputs_type == "inst_crop":
        out["inst_crop_feat"] = np.zeros((n, T, 1280), np.float32)
        out["inst_cls"] = np.zeros((n, T, ctrl_cfg.inst_cls_dim),
                                   np.float32)
        out["inst_pos_emb"] = np.zeros((n, T, 50), np.float32)
    elif ctrl_cfg.inputs_type in INSTANCE_FAMILY:
        # raw serving triple, pruned to exactly what the ablation keeps
        # (inst_fm is ~10 MB/window — never allocated when dropped)
        if "inst_fm" in keys:
            out["inst_fm"] = np.zeros((n, T, 512, 5, 5), np.float32)
        if "inst_cls" in keys:
            out["inst_cls"] = np.zeros((n, T, ctrl_cfg.inst_cls_dim),
                                       np.float32)
        if "inst_pos_emb" in keys:
            out["inst_pos_emb"] = np.zeros((n, T, 50), np.float32)
    else:
        # 562-d serving token layout: [512 appearance | 50 pos-emb],
        # written in place (a final concatenate would re-fault the
        # whole batch every call)
        out["visual_tokens"] = np.zeros((n, T, 562), np.float32)
    # touch every page once so reuse never faults
    for k, a in out.items():
        if k != "frame_ids":
            a.fill(0)
    return out


def generate_windows(rng: np.random.RandomState, n: int, ctrl_cfg,
                     protos: ScenePrototypes | None = None,
                     out: dict | None = None,
                     shift: dict | None = None) -> dict:
    """n training windows shaped for ctrl_cfg.inputs_type.

    Returns the trainer batch dict (leading axis n). All arrays numpy;
    callers jnp.asarray / shard as needed. Pass ``out`` (from
    :func:`alloc_buffers`) to generate in place with zero allocation —
    the caller must finish consuming (e.g. device-put) the previous
    contents first. ``shift`` (DEFAULT_SHIFT keys) moves the scene
    distribution for robustness evals; the label rule follows the
    shifted trajectories.
    """
    F, K = ctrl_cfg.num_frames, ctrl_cfg.tokens_per_frame
    crop = ctrl_cfg.inputs_type == "inst_crop"
    app_dim = 1280 if crop else 512
    protos = protos or ScenePrototypes(app_dim)
    s = {**DEFAULT_SHIFT, **(shift or {})}
    a_lo, a_hi = s["n_actors"]
    c_lo, c_hi = s["clutter"]
    app_noise = s["app_noise"]
    drift = (s["app_drift"] * _unit(np.random.RandomState(1234), app_dim)
             if s["app_drift"] else None)

    if out is None:
        out = alloc_buffers(n, ctrl_cfg)
    else:
        for k, a in out.items():
            if k != "frame_ids":
                a.fill(0)
    pad, has_act, is_obj, act_ids = (out["padding_mask"], out["has_act"],
                                     out["is_obj"], out["act_ids"])
    fm = out.get("inst_fm")
    if crop:
        toks, cls, pos = (out["inst_crop_feat"], out["inst_cls"],
                          out["inst_pos_emb"])
    elif ctrl_cfg.inputs_type in INSTANCE_FAMILY:
        # appearance goes into the RoI feature maps (if kept); cls/pos
        # are whatever this ablation retains
        toks, cls, pos = None, out.get("inst_cls"), out.get("inst_pos_emb")
    else:
        vt = out["visual_tokens"]
        toks, pos, cls = vt[..., :app_dim], vt[..., app_dim:], None

    t_idx = np.arange(F)
    for w in range(n):
        n_act = rng.randint(a_lo, min(a_hi, K - 1) + 1)
        actors = [_actor_track(rng, F, s) for _ in range(n_act)]
        n_clut = rng.randint(c_lo, c_hi + 1)
        for slot, a in enumerate(actors):
            i = t_idx * K + slot                    # (F,) flat indices
            h = a["heights"]
            wd = h * 0.45
            bbox = np.stack([a["cxs"] - wd / 2, IM - 40 - h,
                             a["cxs"] + wd / 2,
                             np.full(F, IM - 40.0)], axis=-1)
            app = (protos.person + 0.6 * protos.bands[a["band"]]
                   + (0.6 * protos.facing if a["facing"] else 0.0)
                   + app_noise * rng.randn(F, app_dim)).astype(np.float32)
            if drift is not None:
                app = app + drift
            if toks is not None:
                toks[w, i, :] = app
            if fm is not None:
                fm[w, i] = (app[:, :, None, None] * FM_SPATIAL
                            + FM_CELL_NOISE
                            * rng.randn(F, app_dim, 5, 5))
            if cls is not None:
                cls[w, i, 0] = 1.0 + 0.1 * rng.randn(F)  # person score
            if pos is not None:
                pos[w, i] = _pos_emb_np(bbox)
            pad[w, i] = 1.0
            grow = np.where(t_idx >= 2,
                            h - h[np.maximum(t_idx - 2, 0)], 0.0)
            trig = (h >= NEAR_H) & (grow >= GROW) & a["facing"]
            has_act[w, trig] = 1.0
            is_obj[w, i[trig]] = 1.0
            act_ids[w, trig] = (1 + a["band"] * 2 +
                                (grow[trig] >= FAST))
        n_c = min(n_clut, K - n_act)
        if n_c > 0:
            slots = n_act + np.arange(n_c)
            i = (t_idx[:, None] * K + slots[None, :]).ravel()   # (F*n_c,)
            cprotos = np.stack([protos.clutter[c % len(protos.clutter)]
                                for c in range(n_c)])
            app = (np.tile(cprotos, (F, 1))
                   + app_noise * rng.randn(F * n_c, app_dim)
                   ).astype(np.float32)
            if drift is not None:
                app = app + drift
            if toks is not None:
                toks[w, i] = app
            if fm is not None:
                fm[w, i] = (app[:, :, None, None] * FM_SPATIAL
                            + FM_CELL_NOISE
                            * rng.randn(F * n_c, app_dim, 5, 5))
            if cls is not None:
                ccls = 1 + rng.randint(ctrl_cfg.inst_cls_dim - 1,
                                       size=F * n_c)
                cls[w, i, ccls] = 1.0
            if pos is not None:
                cb = np.sort(rng.uniform(0, IM, (F * n_c, 2)), axis=-1)
                pos[w, i] = _pos_emb_np(
                    np.stack([cb[:, 0], cb[:, 0], cb[:, 1], cb[:, 1]],
                             axis=-1))
            pad[w, i] = 1.0

    return out


# ---------------------------------------------------------------------------
# On-device generation (JAX). The numpy generator above transfers
# ~F·K·562·4 bytes per window per step host→device — at serving size
# that is ~29 MB per batch-64 train step, which is the wall on a
# remote-attached TPU. This port draws the SAME distributions with
# jax.random so the whole feed fuses into the jitted train step and the
# host↔device traffic disappears. The held-out eval set stays on the
# numpy generator, so convergence doubles as a cross-generator
# distribution check (tests/test_hri_convergence.py pins label-rule
# equivalence and summary stats).

MAX_ACTORS = 3          # rng.randint(0, 4) above
MAX_CLUTTER = 5         # rng.randint(1, 6) above


def device_prototypes(ctrl_cfg, seed: int = 7) -> dict:
    """ScenePrototypes as a dict of device arrays (same seeded draws)."""
    p = ScenePrototypes(1280 if ctrl_cfg.inputs_type == "inst_crop"
                        else 512, seed=seed)
    return {"person": jnp.asarray(p.person),
            "facing": jnp.asarray(p.facing),
            "bands": jnp.asarray(np.stack(p.bands)),
            "clutter": jnp.asarray(np.stack(p.clutter[:MAX_CLUTTER]))}


def _pos_emb_dev(bbox: jnp.ndarray) -> jnp.ndarray:
    """JAX mirror of _pos_emb_np — same [y(25) | x(25)] layout."""
    xmin, ymin, xmax, ymax = (bbox[..., 0], bbox[..., 1],
                              bbox[..., 2], bbox[..., 3])
    s = lambda v: (v - IM / 2) / (IM / 2) * (np.pi / 2)
    tx = jnp.linspace(0.0, 1.0, 5)
    x_pos = jnp.sin(s(xmin)[..., None] + (s(xmax) - s(xmin))[..., None] * tx)
    y_pos = jnp.sin(s(ymin)[..., None] + (s(ymax) - s(ymin))[..., None] * tx)
    x_emb = jnp.broadcast_to(x_pos[..., None, :], x_pos.shape[:-1] + (5, 5))
    y_emb = jnp.broadcast_to(y_pos[..., :, None], y_pos.shape[:-1] + (5, 5))
    return jnp.concatenate(
        [y_emb.reshape(*y_emb.shape[:-2], 25),
         x_emb.reshape(*x_emb.shape[:-2], 25)], axis=-1)


def _gen_one_device(key, pp, F: int, K: int, cls_dim: int, keys: tuple,
                    shift_t: tuple = (60.0, 150.0, 1.0, 0.7, 0.25)):
    """One window (no batch axis); vmapped by generate_windows_device.
    ``keys`` = the variant's token keys (variant_token_keys);
    ``shift_t`` = (h0_min, h0_max, rate_scale, facing_p, app_noise) —
    the device subset of DEFAULT_SHIFT, used to HARDEN the training
    distribution (round-5 shift study). Defaults reproduce the
    original stream byte-identically."""
    h0_min, h0_max, rate_scale, facing_p, app_noise = shift_t
    app_dim = pp["person"].shape[0]
    t = jnp.arange(F, dtype=jnp.float32)
    (k_na, k_act, k_anoise, k_nc, k_cnoise, k_ccls, k_cbox,
     k_acls) = jax.random.split(key, 8)
    n_act = jax.random.randint(k_na, (), 0, MAX_ACTORS + 1)

    def actor(k):
        kk = jax.random.split(k, 12)
        kind = jax.random.choice(kk[0], 4,
                                 p=jnp.array([0.4, 0.2, 0.2, 0.2]))
        h0 = jax.random.uniform(kk[1], (), minval=h0_min, maxval=h0_max)
        rate = jnp.select(
            [kind == 0, kind == 1],
            [jax.random.uniform(kk[2], (), minval=4.0 * rate_scale,
                                maxval=22.0 * rate_scale),
             -jax.random.uniform(kk[3], (), minval=4.0 * rate_scale,
                                 maxval=14.0 * rate_scale)],
            jax.random.uniform(kk[4], (), minval=-1.5, maxval=1.5))
        h = jnp.clip(h0 + rate * t + jax.random.normal(kk[5], (F,)),
                     24.0, 380.0)
        cx = jax.random.uniform(kk[6], (), minval=80.0, maxval=IM - 80.0)
        vx = jnp.where(
            kind == 2,
            jax.random.uniform(kk[7], (), minval=-14.0, maxval=14.0),
            jax.random.uniform(kk[8], (), minval=-4.0, maxval=4.0))
        cxs = jnp.clip(cx + vx * t + jax.random.normal(kk[9], (F,)),
                       10.0, IM - 10.0)
        facing = jax.random.uniform(kk[10], ()) < facing_p
        band = jax.random.randint(kk[11], (), 0, BANDS)
        return h, cxs, facing, band

    h, cxs, facing, band = jax.vmap(actor)(
        jax.random.split(k_act, MAX_ACTORS))          # (A,F),(A,F),(A,),(A,)
    a_active = jnp.arange(MAX_ACTORS) < n_act          # (A,)

    a_base = (pp["person"] + 0.6 * pp["bands"][band]
              + 0.6 * facing[:, None].astype(jnp.float32) * pp["facing"])
    app = (a_base[:, None, :]
           + app_noise * jax.random.normal(k_anoise,
                                           (MAX_ACTORS, F, app_dim))
           )                                           # (A,F,D)
    wd = h * 0.45
    bbox = jnp.stack([cxs - wd / 2, IM - 40.0 - h, cxs + wd / 2,
                      jnp.full_like(h, IM - 40.0)], axis=-1)
    a_pos = _pos_emb_dev(bbox)                         # (A,F,50)

    grow = jnp.concatenate(
        [jnp.zeros((MAX_ACTORS, 2)), h[:, 2:] - h[:, :-2]], axis=1)
    trig = ((h >= NEAR_H) & (grow >= GROW)
            & facing[:, None] & a_active[:, None])     # (A,F)
    act_val = 1 + band[:, None] * 2 + (grow >= FAST).astype(jnp.int32)
    act_ids = jnp.zeros((F,), jnp.int32)
    for a in range(MAX_ACTORS):                        # slot order: last wins
        act_ids = jnp.where(trig[a], act_val[a], act_ids)
    has_act = trig.any(axis=0).astype(jnp.float32)

    n_clut = jax.random.randint(k_nc, (), 1, MAX_CLUTTER + 1)
    n_c = jnp.minimum(n_clut, K - n_act)
    c_active = jnp.arange(MAX_CLUTTER) < n_c           # (C,)
    c_app = (pp["clutter"][:, None, :]
             + app_noise * jax.random.normal(k_cnoise,
                                             (MAX_CLUTTER, F, app_dim)))
    cb = jnp.sort(jax.random.uniform(k_cbox, (MAX_CLUTTER, F, 2),
                                     minval=0.0, maxval=IM), axis=-1)
    c_pos = _pos_emb_dev(jnp.stack(
        [cb[..., 0], cb[..., 0], cb[..., 1], cb[..., 1]], axis=-1))

    # scatter candidates into (F, K, ·); inactive slots index K → dropped
    a_slots = jnp.where(a_active, jnp.arange(MAX_ACTORS), K)
    c_slots = jnp.where(c_active, n_act + jnp.arange(MAX_CLUTTER), K)
    slots = jnp.concatenate([a_slots, c_slots])        # (A+C,)
    cand_app = jnp.concatenate([app, c_app]).swapaxes(0, 1)   # (F,A+C,D)
    cand_pos = jnp.concatenate([a_pos, c_pos]).swapaxes(0, 1)

    ones = jnp.ones((F, MAX_ACTORS + MAX_CLUTTER))
    pad = jnp.zeros((F, K)).at[:, slots].set(ones, mode="drop")
    is_obj = jnp.zeros((F, K)).at[:, a_slots].set(
        trig.T.astype(jnp.float32), mode="drop")

    out = {"has_act": has_act, "act_ids": act_ids,
           "padding_mask": pad.reshape(F * K),
           "is_obj": is_obj.reshape(F * K)}
    if "visual_tokens" in keys:
        cand_tok = jnp.concatenate([cand_app, cand_pos], axis=-1)
        tok = jnp.zeros((F, K, app_dim + 50)).at[:, slots].set(
            cand_tok, mode="drop")
        out["visual_tokens"] = tok.reshape(F * K, app_dim + 50)
        return out
    if "inst_cls" in keys:
        a_cls = jnp.zeros((MAX_ACTORS, F, cls_dim)).at[..., 0].set(
            1.0 + 0.1 * jax.random.normal(k_acls, (MAX_ACTORS, F)))
        ccls_idx = 1 + jax.random.randint(k_ccls, (MAX_CLUTTER, F), 0,
                                          cls_dim - 1)
        c_cls = jax.nn.one_hot(ccls_idx, cls_dim)
        cand_cls = jnp.concatenate([a_cls, c_cls]).swapaxes(0, 1)
        cls = jnp.zeros((F, K, cls_dim)).at[:, slots].set(
            cand_cls, mode="drop")
        out["inst_cls"] = cls.reshape(F * K, cls_dim)
    if "inst_crop_feat" in keys:
        feat = jnp.zeros((F, K, app_dim)).at[:, slots].set(
            cand_app, mode="drop")
        out["inst_crop_feat"] = feat.reshape(F * K, app_dim)
    if "inst_fm" in keys:
        # appearance ⊗ fixed spatial profile + cell noise (noise keys
        # fold_in-derived so the pre-existing variants' streams are
        # byte-identical to before this family existed)
        spatial = jnp.asarray(FM_SPATIAL)
        a_fm = (app[..., None, None] * spatial
                + FM_CELL_NOISE * jax.random.normal(
                    jax.random.fold_in(k_anoise, 1),
                    (MAX_ACTORS, F, app_dim, 5, 5)))
        c_fm = (c_app[..., None, None] * spatial
                + FM_CELL_NOISE * jax.random.normal(
                    jax.random.fold_in(k_cnoise, 1),
                    (MAX_CLUTTER, F, app_dim, 5, 5)))
        cand_fm = jnp.concatenate([a_fm, c_fm]).swapaxes(0, 1)
        fm = jnp.zeros((F, K, app_dim, 5, 5)).at[:, slots].set(
            cand_fm, mode="drop")
        out["inst_fm"] = fm.reshape(F * K, app_dim, 5, 5)
    if "inst_pos_emb" in keys:
        pos = jnp.zeros((F, K, 50)).at[:, slots].set(cand_pos, mode="drop")
        out["inst_pos_emb"] = pos.reshape(F * K, 50)
    return out


@functools.partial(jax.jit, static_argnums=(1, 2))
def _gen_batch_device(key, n: int, static, pp):
    F, K, cls_dim, keys, shift_t = static
    gen = functools.partial(_gen_one_device, pp=pp, F=F, K=K,
                            cls_dim=cls_dim, keys=keys, shift_t=shift_t)
    out = jax.vmap(lambda k: gen(k))(jax.random.split(key, n))
    out["frame_ids"] = jnp.tile(
        jnp.repeat(jnp.arange(1, F + 1), K)[None], (n, 1))
    return out


def generate_windows_device(key, n: int, ctrl_cfg,
                            protos: dict | None = None,
                            shift: dict | None = None) -> dict:
    """On-device mirror of :func:`generate_windows` — same batch keys,
    same label rule, same per-field distributions (different RNG
    stream). Jittable/fusable: call inside a scanned train chunk so the
    feed never leaves the device. ``shift`` (DEFAULT_SHIFT keys; the
    device path honors h0_range / rate_scale / facing_p / app_noise)
    widens the TRAINING distribution — the round-5 hardening lever
    against the shift-eval's threshold instability."""
    pp = protos if protos is not None else device_prototypes(ctrl_cfg)
    s = {**DEFAULT_SHIFT, **(shift or {})}
    shift_t = (float(s["h0_range"][0]), float(s["h0_range"][1]),
               float(s["rate_scale"]), float(s["facing_p"]),
               float(s["app_noise"]))
    static = (ctrl_cfg.num_frames, ctrl_cfg.tokens_per_frame,
              ctrl_cfg.inst_cls_dim,
              variant_token_keys(ctrl_cfg.inputs_type), shift_t)
    return _gen_batch_device(key, n, static, pp)
