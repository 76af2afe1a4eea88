"""Multi-object tracker: Deep-SORT as fixed-shape functional JAX.

Rebuild of HRI/TFVT_HRI/perception/tracker/ (kalman_filter.py:23-229,
tracker.py:222-353, track.py lifecycle): constant-velocity Kalman filter
over (cx, cy, aspect, height) with the standard 1/20 / 1/160 noise
weights and chi² gating; appearance (cosine) cascade matching for
confirmed tracks with motion gating, IoU matching as fallback;
tentative→confirmed→deleted lifecycle.

TPU-native deviations (documented):
- tracks live in a fixed-size slot array (MAX_TRACKS) so the whole
  update jits and vmaps over camera streams;
- assignment uses the exact Hungarian solve (ops/lap.py, validated
  against scipy) inside a fixed-depth `lax.fori_loop` matching cascade —
  the same per-age-level structure as the reference's matching_cascade
  (utils.py:120-175, tracker.py:314-345). `greedy_match` remains as the
  cheap approximate alternative.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from paddlerobotics_tpu.ops import lap

MAX_TRACKS = 32
FEATURE_DIM = 128
CHI2_95_DOF4 = 9.4877   # kalman_filter.py chi2inv95[4]
INF = 1e9

# Track slot states
EMPTY, TENTATIVE, CONFIRMED = 0, 1, 2


class TrackerState(NamedTuple):
    mean: jnp.ndarray        # (T,8) [cx,cy,a,h, vx,vy,va,vh]
    cov: jnp.ndarray         # (T,8,8)
    status: jnp.ndarray      # (T,) EMPTY|TENTATIVE|CONFIRMED
    hits: jnp.ndarray        # (T,)
    time_since_update: jnp.ndarray  # (T,)
    feature: jnp.ndarray     # (T,FEATURE_DIM) smoothed appearance
    track_id: jnp.ndarray    # (T,)
    next_id: jnp.ndarray     # ()


def init_tracker() -> TrackerState:
    return TrackerState(
        mean=jnp.zeros((MAX_TRACKS, 8)),
        cov=jnp.zeros((MAX_TRACKS, 8, 8)),
        status=jnp.zeros(MAX_TRACKS, jnp.int32),
        hits=jnp.zeros(MAX_TRACKS, jnp.int32),
        time_since_update=jnp.zeros(MAX_TRACKS, jnp.int32),
        feature=jnp.zeros((MAX_TRACKS, FEATURE_DIM)),
        track_id=jnp.zeros(MAX_TRACKS, jnp.int32),
        next_id=jnp.ones((), jnp.int32))


# --- Kalman filter (kalman_filter.py semantics) ------------------------------

_W_POS = 1.0 / 20.0
_W_VEL = 1.0 / 160.0


def _motion_mats():
    F = np.eye(8)
    for i in range(4):
        F[i, 4 + i] = 1.0
    H = np.eye(4, 8)
    return jnp.asarray(F), jnp.asarray(H)


def kf_initiate(measurement: jnp.ndarray):
    """measurement (4,) = (cx,cy,a,h) → (mean (8,), cov (8,8))."""
    h = measurement[3]
    mean = jnp.concatenate([measurement, jnp.zeros(4)])
    std = jnp.asarray([2 * _W_POS, 2 * _W_POS, 1e-2, 2 * _W_POS,
                       10 * _W_VEL, 10 * _W_VEL, 1e-5, 10 * _W_VEL])
    scale = jnp.asarray([h, h, 1.0, h, h, h, 1.0, h])
    cov = jnp.diag((std * scale) ** 2)
    return mean, cov


def kf_predict(mean: jnp.ndarray, cov: jnp.ndarray):
    F, _ = _motion_mats()
    h = mean[3]
    std = jnp.asarray([_W_POS, _W_POS, 1e-2, _W_POS,
                       _W_VEL, _W_VEL, 1e-5, _W_VEL])
    scale = jnp.asarray([h, h, 1.0, h, h, h, 1.0, h])
    Q = jnp.diag((std * scale) ** 2)
    return F @ mean, F @ cov @ F.T + Q


def kf_project(mean: jnp.ndarray, cov: jnp.ndarray):
    _, H = _motion_mats()
    h = mean[3]
    std = jnp.asarray([_W_POS, _W_POS, 1e-1, _W_POS])
    scale = jnp.asarray([h, h, 1.0, h])
    R = jnp.diag((std * scale) ** 2)
    return H @ mean, H @ cov @ H.T + R


def kf_update(mean, cov, measurement):
    _, H = _motion_mats()
    pm, pc = kf_project(mean, cov)
    K = cov @ H.T @ jnp.linalg.inv(pc)
    new_mean = mean + K @ (measurement - pm)
    new_cov = cov - K @ pc @ K.T
    return new_mean, new_cov


def kf_gating_distance(mean, cov, measurements):
    """Squared Mahalanobis distance to measurements (M,4) → (M,)."""
    pm, pc = kf_project(mean, cov)
    d = measurements - pm[None, :]
    sol = jnp.linalg.solve(pc, d.T)          # (4,M)
    return jnp.sum(d.T * sol, axis=0)


# --- boxes ↔ measurements ----------------------------------------------------

def xyxy_to_cah(boxes: jnp.ndarray) -> jnp.ndarray:
    """xyxy → (cx, cy, aspect=w/h, h)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1e-6)
    cx = boxes[..., 0] + w / 2
    cy = boxes[..., 1] + h / 2
    return jnp.stack([cx, cy, w / h, h], axis=-1)


def cah_to_xyxy(m: jnp.ndarray) -> jnp.ndarray:
    h = m[..., 3]
    w = m[..., 2] * h
    return jnp.stack([m[..., 0] - w / 2, m[..., 1] - h / 2,
                      m[..., 0] + w / 2, m[..., 1] + h / 2], axis=-1)


# --- greedy assignment -------------------------------------------------------

def greedy_match(cost: jnp.ndarray, max_cost: float,
                 rows_valid: jnp.ndarray, cols_valid: jnp.ndarray):
    """Greedy min-cost matching. cost (R,C) → col_for_row (R,) (−1 none)."""
    R, C = cost.shape
    big = cost + INF * (1 - rows_valid[:, None]) + \
        INF * (1 - cols_valid[None, :])

    def body(carry, _):
        big, assign = carry
        idx = jnp.argmin(big)
        r, c = idx // C, idx % C
        ok = big[r, c] <= max_cost
        assign = jnp.where(ok, assign.at[r].set(c), assign)
        big = jnp.where(ok, big.at[r, :].set(INF).at[:, c].set(INF),
                        big.at[r, c].set(INF))
        return (big, assign), None

    n = min(R, C)
    (_, assign), _ = jax.lax.scan(
        body, (big, -jnp.ones(R, jnp.int32)), None, length=n)
    return assign


# --- tracker update ----------------------------------------------------------

def tracker_predict(state: TrackerState) -> TrackerState:
    """Advance all live tracks one frame (tracker.py predict loop)."""
    mean, cov = jax.vmap(kf_predict)(state.mean, state.cov)
    live = state.status > EMPTY
    return state._replace(
        mean=jnp.where(live[:, None], mean, state.mean),
        cov=jnp.where(live[:, None, None], cov, state.cov),
        time_since_update=state.time_since_update + live)


def tracker_update(state: TrackerState,
                   boxes: jnp.ndarray,
                   features: jnp.ndarray,
                   det_valid: jnp.ndarray,
                   max_cosine_distance: float = 0.2,
                   max_iou_distance: float = 0.7,
                   max_age: int = 30, n_init: int = 3
                   ) -> Tuple[TrackerState, jnp.ndarray]:
    """One Deep-SORT update with D detections (fixed shape).

    boxes (D,4) xyxy, features (D,FEATURE_DIM), det_valid (D,) bool.
    Returns (new_state, track_id_per_detection (D,) — 0 if unassigned).
    """
    D = boxes.shape[0]
    meas = xyxy_to_cah(boxes)

    # 1) appearance cascade for confirmed tracks, with chi² motion gating
    feat_n = features / jnp.maximum(
        jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-9)
    tfeat_n = state.feature / jnp.maximum(
        jnp.linalg.norm(state.feature, axis=-1, keepdims=True), 1e-9)
    cos_cost = 1.0 - tfeat_n @ feat_n.T                    # (T,D)
    gate = jax.vmap(lambda m, c: kf_gating_distance(m, c, meas))(
        state.mean, state.cov)                             # (T,D)
    cost1 = jnp.where(gate > CHI2_95_DOF4, INF, cos_cost)
    confirmed = state.status == CONFIRMED

    # matching cascade (utils.py matching_cascade:120-175): one exact
    # Hungarian solve per track age level, freshest tracks first, each
    # level seeing only the still-unmatched detections
    def cascade_level(level, carry):
        assign, det_matched = carry
        rows = confirmed & (state.time_since_update == 1 + level) & \
            (assign < 0)
        cols = det_valid & ~det_matched

        def run(_):
            return lap.min_cost_match(cost1, max_cosine_distance,
                                      rows.astype(jnp.float32),
                                      cols.astype(jnp.float32))

        a = jax.lax.cond(jnp.any(rows) & jnp.any(cols), run,
                         lambda _: jnp.full(cost1.shape[0], -1, jnp.int32),
                         None)
        assign = jnp.where(a >= 0, a, assign)
        det_matched = det_matched | (
            jnp.zeros(D).at[jnp.maximum(a, 0)].add(
                (a >= 0).astype(jnp.float32)) > 0)
        return assign, det_matched

    assign1 = -jnp.ones(MAX_TRACKS, jnp.int32)
    assign1, matched_det1 = jax.lax.fori_loop(
        0, max_age, cascade_level,
        (assign1, jnp.zeros(D, bool)))

    # 2) IoU matching for remaining tracks: tentative tracks plus
    #    confirmed tracks unmatched for exactly one frame
    #    (tracker.py:330-340)
    track_boxes = cah_to_xyxy(state.mean[:, :4])
    iou_cost = 1.0 - _iou(track_boxes, boxes)
    rows2 = (((state.status == TENTATIVE) |
              (confirmed & (state.time_since_update == 1))) &
             (assign1 < 0)).astype(jnp.float32)
    cols2 = (det_valid & ~matched_det1).astype(jnp.float32)
    assign2 = lap.min_cost_match(iou_cost, max_iou_distance, rows2, cols2)

    assign = jnp.where(assign1 >= 0, assign1, assign2)

    # 3) update matched tracks
    def upd(mean, cov, a):
        new_m, new_c = kf_update(mean, cov, meas[jnp.maximum(a, 0)])
        return new_m, new_c

    new_mean, new_cov = jax.vmap(upd)(state.mean, state.cov, assign)
    matched = assign >= 0
    mean = jnp.where(matched[:, None], new_mean, state.mean)
    cov = jnp.where(matched[:, None, None], new_cov, state.cov)
    hits = jnp.where(matched, state.hits + 1, state.hits)
    tsu = jnp.where(matched, 0, state.time_since_update)
    feat = jnp.where(matched[:, None],
                     0.5 * state.feature +
                     0.5 * features[jnp.maximum(assign, 0)],
                     state.feature)
    status = state.status
    status = jnp.where(matched & (status == TENTATIVE) & (hits >= n_init),
                       CONFIRMED, status)
    # deletion: tentative missed once, confirmed too old
    status = jnp.where((status == TENTATIVE) & ~matched & (tsu > 0),
                       EMPTY, status)
    status = jnp.where(tsu > max_age, EMPTY, status)

    st = state._replace(mean=mean, cov=cov, status=status, hits=hits,
                        time_since_update=tsu, feature=feat)

    # 4) initiate new tracks for unmatched detections into empty slots
    det_matched = jnp.zeros(D).at[jnp.maximum(assign, 0)].add(
        (assign >= 0).astype(jnp.float32)) > 0
    new_dets = det_valid & ~det_matched

    def initiate(st, d):
        slot = jnp.argmin(st.status)              # first EMPTY slot
        can = (st.status[slot] == EMPTY) & new_dets[d]
        m0, c0 = kf_initiate(meas[d])
        return TrackerState(
            mean=jnp.where(can, st.mean.at[slot].set(m0), st.mean),
            cov=jnp.where(can, st.cov.at[slot].set(c0), st.cov),
            status=jnp.where(can, st.status.at[slot].set(TENTATIVE),
                             st.status),
            hits=jnp.where(can, st.hits.at[slot].set(1), st.hits),
            time_since_update=jnp.where(
                can, st.time_since_update.at[slot].set(0),
                st.time_since_update),
            feature=jnp.where(can, st.feature.at[slot].set(features[d]),
                              st.feature),
            track_id=jnp.where(can, st.track_id.at[slot].set(st.next_id),
                               st.track_id),
            next_id=jnp.where(can, st.next_id + 1, st.next_id)), None

    st, _ = jax.lax.scan(initiate, st, jnp.arange(D))

    # per-detection track ids
    det_tid = jnp.zeros(D, jnp.int32).at[jnp.maximum(assign, 0)].add(
        jnp.where(assign >= 0, st.track_id, 0))
    return st, det_tid


def _iou(a, b):
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    return inter / jnp.maximum(area_a + area_b - inter, 1e-9)
