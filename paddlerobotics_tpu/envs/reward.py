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
branch-free, per-step bounded. Because the exact shapes are not
recoverable from the reference (MonitorEnv is in the unvendored
rlschool), each term's SCALE is calibrated so that the reference's
DEFAULT weight vector (torso 1.5, up 0.6, feet 0.3, tau 0.07,
badfoot 0.1, footcontact 0.1) reproduces the hand-validated
stairs-learning effective reward (round-1 recipe: torso 3.0, up 0.2,
feet 0.5, tau 0.05, badfoot 0.05, footcontact 0.05 — CLAUDE.md):
shape_k := shape_k^{r1} · (w_k^{validated} / w_k^{default}). With these
shapes, `--task_mode stairstair` learns stair climbing under the
unmodified reference flag defaults (the reference's headline behavioral
claim); see docs/reward_calibration.md.

This module is the SINGLE source of truth for rewards: both the per-env
path and the batch-minor SoA path call it (all reductions are axis=0,
so (12,)/(12,B) etc. both work).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from paddlerobotics_tpu.core.config import RewardConfig

REWARD_CHANNELS = ("torso", "up", "feet", "tau", "stand", "badfoot",
                   "footcontact", "lateral", "velx", "rew")


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
                   y_pos: jnp.ndarray | float = 0.0,
                   vel_y: jnp.ndarray | float = 0.0,
                   yaw: jnp.ndarray | float = 0.0,
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
      y_pos: world lateral base position (m) — courses run along +x
        from y=0, so |y| is distance off the centerline.
      vel_y: world lateral base velocity (m/s).
      yaw: world heading error (rad; spawn heading = 0).
    """
    # torso: forward progress toward vel_d, capped so over-speed isn't
    # free. ×2.0 calibration (validated 3.0 / default 1.5).
    r_torso = 2.0 * jnp.minimum(dx, cfg.vel_d * 0.026 * 2.0)
    # up: uprightness + rotational calmness. ×1/3 (0.2/0.6).
    r_up = ((up_z - 1.0) - 0.05 * jnp.sum(drpy[:2] ** 2, axis=0)) / 3.0
    # feet: swing feet should clear the ground (up to 6 cm counts).
    # ×5/3 (0.5/0.3).
    clear = jnp.clip(foot_clearance, 0.0, 0.06) / 0.06
    n_swing = jnp.maximum(jnp.sum(swing_mask, axis=0), 1.0)
    r_feet = jnp.sum(clear * swing_mask, axis=0) / n_swing * (0.026 * 5 / 3)
    # tau: energy penalty. ×5/7 (0.05/0.07).
    r_tau = -1e-4 * (5.0 / 7.0) * jnp.sum(torques ** 2, axis=0)
    # stand: stillness shaping (weight 0 by default, as in the reference).
    r_stand = -jnp.abs(velx) * 0.026
    # badfoot: knee or trunk illegal contact penalty. ×1/2 (0.05/0.1).
    r_badfoot = -(jnp.sum(knee_contacts.astype(jnp.float32), axis=0)
                  + base_contact.astype(jnp.float32)) * 0.013
    # footcontact: stance feet must actually touch the ground.
    # ×1/2 (0.05/0.1).
    miss = stance_mask * (1.0 - foot_contacts.astype(jnp.float32))
    r_footcontact = -jnp.sum(miss, axis=0) * 0.013
    # lateral: centerline tracking (balance-beam shaping; weight 0 by
    # default). |y| normalized by the beam half-width scale (0.15 m),
    # lateral speed damps the drift mode, yaw keeps the heading down
    # the plank. Per-step scale matches the other channels (~0.026 at
    # full displacement) so weight 1.0 trades ~1:1 against torso.
    r_lateral = -(jnp.abs(y_pos) / 0.15
                  + 0.5 * jnp.abs(vel_y)
                  + 0.5 * jnp.abs(yaw)) * 0.026

    reward = cfg.reward_p * (
        cfg.torso * r_torso
        + cfg.up * r_up
        + cfg.feet * r_feet
        + cfg.tau * r_tau
        + cfg.stand * r_stand
        + cfg.badfoot * r_badfoot
        + cfg.footcontact * r_footcontact
        + cfg.lateral * r_lateral)

    info = {
        "torso": r_torso, "up": r_up, "feet": r_feet, "tau": r_tau,
        "stand": r_stand, "badfoot": r_badfoot, "footcontact": r_footcontact,
        "lateral": r_lateral, "velx": velx, "rew": reward,
    }
    return reward, info
