"""Least-squares fit of the ETG linear readout onto control points.

Rebuild of ``Opt_with_points``/``LS_sol`` (ETGRL/train.py:59-110). The
reference solves the (possibly proximal-regularized) least squares by
hand-rolled gradient descent; its fixed point is the closed form
    (AᵀA + λI) x = Aᵀb + λ w₀,
which we solve directly — exact, batched, and differentiable, so an entire
ES population of candidate control points is fitted in one vmapped solve
(replacing the reference's per-candidate Python loop at train.py:404-408).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from paddlerobotics_tpu.core.config import ETGConfig
from paddlerobotics_tpu.etg import oscillator


def sample_times(cfg: ETGConfig) -> np.ndarray:
    """The six fit times (train.py:82): one mid-stance + five swing."""
    return np.array([0.5 * cfg.T + 0.1, 0.0, 0.05, 0.1, 0.15, 0.2])


def prior_points(cfg: ETGConfig) -> np.ndarray:
    """Default swing control points (x, z), shape (6, 2) (train.py:84-88)."""
    s, h, p = cfg.steplen, cfg.footheight, cfg.penetration
    return np.array([
        [0.0, -p],
        [-s, -p * 0.5],
        [-1.5 * s, 0.6 * h],
        [0.0, h],
        [1.5 * s, 0.6 * h],
        [s, -p * 0.5],
    ])


def basis_matrix(cfg: ETGConfig) -> jnp.ndarray:
    """A = V(tₛ) stacked over the six sample times, (6, H)."""
    return oscillator.update(jnp.asarray(sample_times(cfg)), cfg)


def _solve(A: jnp.ndarray, b: jnp.ndarray, lamb: float,
           w0: jnp.ndarray | None) -> jnp.ndarray:
    """argmin λ‖x − w₀‖² + ‖Ax − b‖², via the *dual* (kernel) form.

    The system is underdetermined (6 equations, H=20 unknowns), so we solve
    the well-conditioned 6×6 dual instead of the rank-deficient H×H normal
    equations: x = w₀ + Aᵀ (A Aᵀ + λI)⁻¹ (b − A w₀). With w₀ = 0 and λ→0
    this is the minimum-norm interpolant (the reference's GD-from-zero
    solver converges to the same fixed point).
    """
    n = A.shape[0]
    K = A @ A.T                                   # (6,6) Gram matrix
    reg = lamb if w0 is not None else 1e-4 * jnp.trace(K) / n
    if w0 is None:
        resid = b
        base = jnp.zeros(A.shape[1], dtype=A.dtype)
    else:
        resid = b - A @ w0
        base = w0
    alpha = jnp.linalg.solve(K + reg * jnp.eye(n), resid)
    return base + A.T @ alpha


def opt_with_points(cfg: ETGConfig,
                    points: jnp.ndarray | None = None,
                    w0: jnp.ndarray | None = None,
                    b0: jnp.ndarray | None = None,
                    lamb: float = 0.5):
    """Fit readout (w, b) so that w·V(tₛ)+b passes through the control points.

    Args:
      points: (6,2) control points (x, z); defaults to `prior_points`.
      w0: optional previous (3,H) readout for proximal regularization.
      b0: optional previous (3,) offset.

    Returns:
      (w, b): w (3,H) rows [x; 0; z], b (3,) — the layout train.py:108-109
      produces (y row zero).
    """
    if points is None:
        points = jnp.asarray(prior_points(cfg))
    A = basis_matrix(cfg)
    if b0 is None:
        b = jnp.mean(points, axis=0)            # (2,)
    else:
        b = jnp.stack([b0[0], b0[-1]])
    pt = points - b
    w0x = None if w0 is None else w0[0]
    w0z = None if w0 is None else w0[-1]
    x = _solve(A, pt[:, 0], lamb, w0x)
    z = _solve(A, pt[:, 1], lamb, w0z)
    H = A.shape[-1]
    w = jnp.stack([x, jnp.zeros(H), z], axis=0)
    b3 = jnp.stack([b[0], jnp.zeros(()), b[1]])
    return w, b3


def batched_opt_with_points(cfg: ETGConfig,
                            points_batch: jnp.ndarray,
                            w0: jnp.ndarray,
                            b0: jnp.ndarray,
                            lamb: float = 0.5):
    """vmap `opt_with_points` over a population of control-point sets.

    points_batch: (P, 6, 2) → returns (w (P,3,H), b (P,3)).
    """
    fn = lambda pts: opt_with_points(cfg, pts, w0=w0, b0=b0, lamb=lamb)
    return jax.vmap(fn)(points_batch)
