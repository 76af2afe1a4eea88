"""Butterworth action filter as a fixed-shape linear recurrence.

Rebuild of the reference's ActionFilterButter
(deployment/robots/action_filter.py:111-120 — an order-2 low-pass at
[0, 4] Hz re-implementing scipy's lfilter recursion per joint, with
history initialized to the default pose to avoid reset jerk,
EnvWrapper.py:307-316).

We compute the (b, a) coefficients host-side with scipy once (static
config) and run the direct-form-II-transposed recurrence on device with a
(2, 12) carried state — no deques, vmappable.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def butter_lowpass_coeffs(sampling_rate: float, highcut: float = 4.0,
                          order: int = 2):
    """Low-pass Butterworth (b, a) (action_filter.py defaults: 0–4 Hz)."""
    from scipy import signal

    b, a = signal.butter(order, highcut / (0.5 * sampling_rate),
                         btype="low")
    return np.asarray(b, np.float32), np.asarray(a, np.float32)


def init_filter_state(b: np.ndarray, a: np.ndarray,
                      x0: jnp.ndarray) -> jnp.ndarray:
    """DF2T carried state (2, n) such that a constant input x0 yields x0
    (steady state — the reference's init_history trick)."""
    z0 = (1.0 - b[0]) * x0
    z1 = (b[2] - a[2]) * x0
    return jnp.stack([z0, z1])


def filter_step(b: np.ndarray, a: np.ndarray,
                z: jnp.ndarray, x: jnp.ndarray):
    """One DF2T step. Returns (y, new_state)."""
    y = b[0] * x + z[0]
    z0 = b[1] * x - a[1] * y + z[1]
    z1 = b[2] * x - a[2] * y
    return y, jnp.stack([z0, z1])
