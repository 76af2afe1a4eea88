"""Analytic terrain height fields for the nine reference task modes.

The reference builds its terrains as PyBullet meshes/boxes inside rlschool
(task grids at ETGRL/train.py:48-50: STEP_HEIGHT 0.08–0.10, SLOPE 0.2–0.4,
STEP_WIDTH 0.26–0.40; nine task modes per ETGRL/README.md). Here every
terrain is a closed-form, jit-friendly height function h(x, y) so contact
queries are pure math — no meshes, no host lookups, exact batching.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from paddlerobotics_tpu.core.config import TaskConfig

TASK_MODES = (
    "ground", "gallop",
    "up_slope", "down_slope", "slopeslope",
    "up_stair", "down_stair", "stairstair",
    "obstacle", "balance_beam",
)

_NUM_STEPS = 10      # steps in a staircase before plateau
_SLOPE_RUN = 3.0     # meters of slope before plateau


def _hash01(ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """Deterministic pseudo-random [0,1) per integer grid cell (obstacle
    field). int32-only mixing: Mosaic (Pallas TPU) has no uint32→float
    cast, so we mask to the low 23 bits before converting."""
    h = ix * 374761393 + iy * 668265263
    h = (h ^ (h >> 13)) * 1274126177
    h = h ^ (h >> 16)
    h = h & 0x7FFFFF
    return h.astype(jnp.float32) * (1.0 / float(0x800000))


def height_fn(task: TaskConfig) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Return h(x, y) for the configured task. Shapes broadcast."""
    mode = task.task_mode
    x0 = task.terrain_start
    sh, sw, sl = task.step_height, task.step_width, task.slope

    if mode not in TASK_MODES:
        raise ValueError(f"unknown task_mode {mode!r}; choose from {TASK_MODES}")

    if mode in ("ground", "gallop"):
        def h(x, y):
            return jnp.zeros_like(x)
    elif mode == "up_slope":
        def h(x, y):
            return sl * jnp.clip(x - x0, 0.0, _SLOPE_RUN)
    elif mode == "down_slope":
        def h(x, y):
            return -sl * jnp.clip(x - x0, 0.0, _SLOPE_RUN)
    elif mode == "slopeslope":
        # up then down (triangle profile)
        def h(x, y):
            up = sl * jnp.clip(x - x0, 0.0, _SLOPE_RUN)
            down = sl * jnp.clip(x - (x0 + _SLOPE_RUN), 0.0, _SLOPE_RUN)
            return up - down
    elif mode == "up_stair":
        def h(x, y):
            n = jnp.clip(jnp.floor((x - x0) / sw) + 1.0, 0.0, _NUM_STEPS)
            return sh * n
    elif mode == "down_stair":
        def h(x, y):
            n = jnp.clip(jnp.floor((x - x0) / sw) + 1.0, 0.0, _NUM_STEPS)
            return -sh * n
    elif mode == "stairstair":
        # staircase up then staircase down (train.py default task).
        def h(x, y):
            n_up = jnp.clip(jnp.floor((x - x0) / sw) + 1.0, 0.0, _NUM_STEPS)
            x1 = x0 + _NUM_STEPS * sw + 1.0  # 1 m platform on top
            n_dn = jnp.clip(jnp.floor((x - x1) / sw) + 1.0, 0.0, _NUM_STEPS)
            return sh * (n_up - n_dn)
    elif mode == "obstacle":
        # pseudo-random rectangular blocks on a 0.5 m grid, up to step_height.
        def h(x, y):
            gx = jnp.floor((x - x0) / 0.5).astype(jnp.int32)
            gy = jnp.floor(y / 0.5).astype(jnp.int32)
            r = _hash01(gx, gy)
            present = (r > 0.55) & (gx >= 0)
            hgt = sh * (0.5 + 0.5 * _hash01(gy + 7, gx + 13))
            return jnp.where(present, hgt, 0.0)
    elif mode == "balance_beam":
        # Narrow plank, level with the approach, spanning a drop
        # (ETGRL/README.md:65 — step_y narrows the stance to keep feet
        # on it; gif bottom row). Off the plank the ground falls 0.5 m
        # and keeps descending at 2:1 away from the beam — there is no
        # walkable ditch floor (termination is terrain-relative, so a
        # FLAT ditch would let a survivable lander run below the beam
        # collecting progress reward; the steep side slope makes any
        # off-beam landing a fall).
        bw, bl = task.beam_width, task.beam_length
        def h(x, y):
            over_gap = (x >= x0) & (x < x0 + bl)
            off = jnp.maximum(jnp.abs(y) - bw / 2, 0.0)
            drop = -0.5 - 2.0 * off
            return jnp.where(over_gap & (off > 0), drop, 0.0)
    return h


def height_and_normal(h_fn, x: jnp.ndarray, y: jnp.ndarray, eps: float = 0.01):
    """Height plus finite-difference surface normal (unit, points up)."""
    h = h_fn(x, y)
    dhdx = (h_fn(x + eps, y) - h_fn(x - eps, y)) / (2 * eps)
    dhdy = (h_fn(x, y + eps) - h_fn(x, y - eps)) / (2 * eps)
    n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(h)], axis=-1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    return h, n
