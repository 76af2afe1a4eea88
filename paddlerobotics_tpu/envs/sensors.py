"""Observation assembly: sensor channels → flat obs vector.

Reproduces the reference's sensor layout and normalization exactly
(deployment/envs/EnvWrapper.py:60-109): sensors are assembled in
*alphabetical key order* (EnvWrapper.py:98) —
  BaseDisplacement(3) < FootContactSensor(4) < IMU(6) < MotorAngleAcc(24)
— with the ETG signal (12) appended last, giving the flat layout
  dis[0:3], contact[3:7], rpy[7:10], drpy[10:13], q[13:25], q̇[25:37],
  ETG[37:49]
(confirmed by deployment/test.py:26-46 dims and BCtrain.py:53-58 slices).

Normalization constants are the reference's: motor (q−q₀)/0.1, q̇/1.0,
rpy/0.1, drpy/0.5 (EnvWrapper.py:66-92), ETG (x−μ)/σ with the constants
at EnvWrapper.py:50-55.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from paddlerobotics_tpu.core import math3d
from paddlerobotics_tpu.core.config import SensorConfig
from paddlerobotics_tpu.sim import a1_model as a1

# EnvWrapper.py:50-55 — normalization stats of the ETG joint-space signal.
ETG_MEAN = np.array([
    2.1505982e-02, 3.6674485e-02, -6.0444288e-02,
    2.4625482e-02, 1.5869144e-02, -3.2513142e-02,
    2.1506395e-02, 3.1869926e-02, -6.0140789e-02,
    2.4625063e-02, 1.1628972e-02, -3.2163858e-02])
ETG_STD = np.array([
    4.5967497e-02, 2.0340437e-01, 3.7410179e-01,
    4.6187632e-02, 1.9441207e-01, 3.9488649e-01,
    4.5966785e-02, 2.0323379e-01, 3.7382501e-01,
    4.6188373e-02, 1.9457331e-01, 3.9302582e-01])

# Gaussian sensor-noise stds per channel type (minitaur._AddSensorNoise
# semantics; magnitudes follow motion_imitation's defaults).
NOISE_STD = {
    "dis": 0.05,
    "contact": 0.0,
    "rpy": 0.01,
    "drpy": 0.05,
    "q": 0.01,
    "qd": 0.1,
}


def assemble_obs(cfg: SensorConfig,
                 base_vel_w: jnp.ndarray,
                 foot_contacts: jnp.ndarray,
                 rpy: jnp.ndarray,
                 drpy: jnp.ndarray,
                 q_obs: jnp.ndarray,
                 qd_obs: jnp.ndarray,
                 etg_act: jnp.ndarray,
                 etg_features: jnp.ndarray | None = None,
                 foot_pose: jnp.ndarray | None = None,
                 dynamic_vec: jnp.ndarray | None = None,
                 ext_force: jnp.ndarray | None = None,
                 rng: jax.Array | None = None) -> jnp.ndarray:
    """Flat observation for one env (vmap for batches)."""
    parts = []
    if cfg.noise and rng is not None:
        ks = jax.random.split(rng, 6)
        base_vel_w = base_vel_w + NOISE_STD["dis"] * jax.random.normal(ks[0], (3,))
        rpy = rpy + NOISE_STD["rpy"] * jax.random.normal(ks[2], (3,))
        drpy = drpy + NOISE_STD["drpy"] * jax.random.normal(ks[3], (3,))
        q_obs = q_obs + NOISE_STD["q"] * jax.random.normal(ks[4], (12,))
        qd_obs = qd_obs + NOISE_STD["qd"] * jax.random.normal(ks[5], (12,))

    if cfg.dis:
        parts.append(base_vel_w)
    if cfg.contact:
        parts.append(foot_contacts.astype(jnp.float32))
    if cfg.imu == 1:
        if cfg.normal:
            parts.append(jnp.concatenate([rpy / 0.1, drpy / 0.5]))
        else:
            parts.append(jnp.concatenate([rpy, drpy]))
    elif cfg.imu == 2:
        parts.append(drpy / 0.5 if cfg.normal else drpy)
    if cfg.motor == 1:
        q_n = (q_obs - jnp.asarray(a1.INIT_MOTOR_ANGLES)) / 0.1 if cfg.normal else q_obs
        qd_n = qd_obs / 1.0
        parts.append(jnp.concatenate([q_n, qd_n]))
    elif cfg.motor == 2:
        q_n = (q_obs - jnp.asarray(a1.INIT_MOTOR_ANGLES)) / 0.1 if cfg.normal else q_obs
        parts.append(q_n)
    if cfg.etg:
        e = (etg_act - jnp.asarray(ETG_MEAN)) / jnp.asarray(ETG_STD) \
            if cfg.normal else etg_act
        parts.append(e)
    if cfg.etg_obs and etg_features is not None:
        parts.append(etg_features)
    if cfg.footpose and foot_pose is not None:
        parts.append(foot_pose.reshape(-1))
    if cfg.dynamic_vec and dynamic_vec is not None:
        # normalized [-1,1]⁴⁸ dynamics echo (SENSOR_MODE["dynamic_vec"],
        # train.py:268) — already normalized, appended raw
        parts.append(dynamic_vec)
    if cfg.force_vec and ext_force is not None:
        parts.append(ext_force)
    return jnp.concatenate(parts)
