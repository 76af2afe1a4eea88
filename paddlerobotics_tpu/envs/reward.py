"""Shaped reward with the reference's per-channel structure.

The reference's reward lives in rlschool's MonitorEnv [not vendored —
inferred]. Its channel names and weights come from Param_Dict
(ETGRL/train.py:255-261: torso 1.5, up 0.6, feet 0.3, tau 0.07, stand 0,
badfoot 0.1, footcontact 0.1), the global scale from --reward_p (=5), the
velocity target from --vel_d, and the per-step success metric from
train.py:156 (velx ≥ 0.3 m/s). Every channel is returned in `info` so the
trainer can log episode_{torso,feet,up,tau,...} exactly like the
reference's summary scalars (train.py:363-366).

Term definitions below are our TPU-native reconstruction: smooth,
branch-free, per-step bounded.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from paddlerobotics_tpu.core.config import RewardConfig

REWARD_CHANNELS = ("torso", "up", "feet", "tau", "stand", "badfoot",
                   "footcontact", "velx", "rew")


def compute_reward(cfg: RewardConfig,
                   dx: jnp.ndarray,
                   velx: jnp.ndarray,
                   up_z: jnp.ndarray,
                   drpy: jnp.ndarray,
                   torques: jnp.ndarray,
                   foot_clearance: jnp.ndarray,
                   swing_mask: jnp.ndarray,
                   stance_mask: jnp.ndarray,
                   foot_contacts: jnp.ndarray,
                   knee_contacts: jnp.ndarray,
                   base_contact: jnp.ndarray,
                   ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Per-step reward and info channels for one env.

    Args:
      dx: forward (world x) displacement this control step (m).
      velx: forward velocity (m/s).
      up_z: world-z component of the base z-axis (1 = upright).
      drpy: base angular velocity (3,).
      torques: (12,) applied torques.
      foot_clearance: (4,) foot height above local terrain (m).
      swing_mask/stance_mask: (4,) gait-phase masks from the ETG.
      foot_contacts: (4,) bool foot-ground contact.
      knee_contacts: (4,) bool knee/calf illegal contact.
      base_contact: () bool trunk-ground contact.
    """
    # torso: forward progress toward vel_d, capped so over-speed isn't free.
    r_torso = jnp.minimum(dx, cfg.vel_d * 0.026 * 2.0)
    # up: uprightness + rotational calmness.
    r_up = (up_z - 1.0) - 0.05 * jnp.sum(drpy[:2] ** 2)
    # feet: swing feet should clear the ground (up to 6 cm counts).
    clear = jnp.clip(foot_clearance, 0.0, 0.06) / 0.06
    n_swing = jnp.maximum(jnp.sum(swing_mask), 1.0)
    r_feet = jnp.sum(clear * swing_mask) / n_swing * 0.026
    # tau: energy penalty.
    r_tau = -1e-4 * jnp.sum(torques ** 2)
    # stand: stillness shaping (weight 0 by default, as in the reference).
    r_stand = -jnp.abs(velx) * 0.026
    # badfoot: knee or trunk illegal contact penalty.
    r_badfoot = -(jnp.sum(knee_contacts.astype(jnp.float32))
                  + base_contact.astype(jnp.float32)) * 0.026
    # footcontact: stance feet must actually touch the ground.
    miss = stance_mask * (1.0 - foot_contacts.astype(jnp.float32))
    r_footcontact = -jnp.sum(miss) * 0.026

    reward = cfg.reward_p * (
        cfg.torso * r_torso
        + cfg.up * r_up
        + cfg.feet * r_feet
        + cfg.tau * r_tau
        + cfg.stand * r_stand
        + cfg.badfoot * r_badfoot
        + cfg.footcontact * r_footcontact)

    info = {
        "torso": r_torso, "up": r_up, "feet": r_feet, "tau": r_tau,
        "stand": r_stand, "badfoot": r_badfoot, "footcontact": r_footcontact,
        "velx": velx, "rew": reward,
    }
    return reward, info
