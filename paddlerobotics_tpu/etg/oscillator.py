"""ETG oscillator: 2-phase harmonic cycle expanded through RBF basis.

Rebuild of rlschool's ``ETG_layer`` [inferred interface — the class is not
vendored in the reference; constructor signature and usage at
ETGRL/train.py:296-297 (``ETG_layer(T, 0.026, H, 0.04, phase, 0.2, T2)``)
and feature dim 20 at train.py:93].

The oscillator traces a closed 2-D curve
    p(t) = amp · [sin(2π t/T + φ₀), sin(2π t/T₂ + φ₁)]
(with the reference defaults φ = [-π/2, 0] and T = T₂ this is a circle),
and the phase is encoded through H Gaussian radial basis functions with
centers sampled uniformly along one period:
    V_i(t) = exp(−‖p(t) − p(t_i)‖² / σ²),  t_i = i·T/H.
A linear readout w·V(t)+b (see etg/fit.py) turns the phase encoding into
foot-trajectory deltas.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from paddlerobotics_tpu.core.config import ETGConfig


def phase_point(t: jnp.ndarray, cfg: ETGConfig) -> jnp.ndarray:
    """Oscillator position p(t), shape t.shape + (2,)."""
    w1 = 2.0 * jnp.pi / cfg.T
    w2 = 2.0 * jnp.pi / cfg.T2
    p1 = cfg.amp * jnp.sin(w1 * t + cfg.phase[0])
    p2 = cfg.amp * jnp.sin(w2 * t + cfg.phase[1])
    return jnp.stack([p1, p2], axis=-1)


def centers(cfg: ETGConfig) -> np.ndarray:
    """RBF centers along one period, shape (H, 2). Computed host-side."""
    ts = np.arange(cfg.H) * cfg.T / cfg.H
    w1 = 2.0 * np.pi / cfg.T
    w2 = 2.0 * np.pi / cfg.T2
    p1 = cfg.amp * np.sin(w1 * ts + cfg.phase[0])
    p2 = cfg.amp * np.sin(w2 * ts + cfg.phase[1])
    return np.stack([p1, p2], axis=-1)


def update(t: jnp.ndarray, cfg: ETGConfig) -> jnp.ndarray:
    """RBF feature vector V(t), shape t.shape + (H,).

    Equivalent of ``ETG_layer.update(t)`` (used at train.py:90-92)."""
    p = phase_point(t, cfg)                      # (..., 2)
    u = jnp.asarray(centers(cfg))                # (H, 2)
    d2 = jnp.sum((p[..., None, :] - u) ** 2, axis=-1)
    return jnp.exp(-d2 / cfg.sigma_sq)


def feature_table(cfg: ETGConfig, n_steps: int) -> jnp.ndarray:
    """Precompute V(t_k) for control-step times t_k = k·dt (mod T).

    Because dt and T are static, a whole episode's phase features are a
    (n_steps, H) constant — the env indexes this table instead of
    re-evaluating transcendentals every step.
    """
    ts = jnp.arange(n_steps) * cfg.dt
    return update(ts, cfg)
