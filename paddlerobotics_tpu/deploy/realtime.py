"""Real-time control loop (rebuild of deployment/test.py + the
ControlLoopWrapper pacing, EnvWrapper.py:243-268).

The hardware interface is abstracted behind `RobotIO` so the same loop
drives the batched simulator (for HIL-style testing) or a real robot
bridge (the reference uses a Unitree LCM bridge, a1_robot.py:38; any
object with read_state/apply_action works — e.g. a UDP/LCM shim).
"""

from __future__ import annotations

import time
from typing import Callable, Protocol

import jax
import jax.numpy as jnp
import numpy as np


class RobotIO(Protocol):
    def read_state(self) -> dict: ...
    def apply_action(self, joint_targets: np.ndarray) -> None: ...


class SimRobotIO:
    """Drives one env of the batched simulator through the RobotIO
    protocol — the deployment loop's software-in-the-loop test double
    (mirrors deployment/test.py:83-90 building a DIRECT PyBullet)."""

    def __init__(self, env, rng=None):
        # The deployment policy already folds the gait into its targets
        # (policy_export), so the sim env must not add its own ETG
        # residual: reset with zero readout. Build the env with
        # step_y=0 for an exact passthrough.
        self.env = env
        H = env.cfg.etg.H
        zero_w = jnp.zeros((3, H, env.B))
        zero_b = jnp.zeros((3, env.B))
        state, obs = jax.jit(env.reset)(rng or jax.random.key(0),
                                        zero_w, zero_b)
        self.state = state
        self.obs = obs
        self._step = jax.jit(
            lambda s, a: env.step(s, a, autoreset=False))

    def read_state(self) -> dict:
        return {"obs": np.asarray(self.obs[0])}

    def apply_action(self, joint_targets: np.ndarray) -> None:
        # joint_targets are absolute; env.step expects the residual part
        # already folded, so drive in raw-action passthrough form.
        import paddlerobotics_tpu.sim.a1_model as a1
        residual = joint_targets - np.asarray(a1.INIT_MOTOR_ANGLES)
        act = jnp.asarray(residual)[None, :].repeat(self.env.B, 0)
        self.state, self.obs, _, _, _ = self._step(self.state, act)


def run_control_loop(policy: Callable, io: RobotIO,
                     dt: float = 0.026, max_time: float = 1.0,
                     log: bool = True):
    """100 Hz-style paced loop: policy(obs, i) → targets → robot; sleeps
    the dt remainder (deployment/test.py:93-103). Returns obs/action logs
    (saved as npz by the reference, test.py:105)."""
    obs_list, act_list = [], []
    n = int(max_time / dt)
    for i in range(n):
        t0 = time.perf_counter()
        state = io.read_state()
        obs = jnp.asarray(state["obs"])
        target = np.asarray(policy(obs, jnp.asarray(i, jnp.int32)))
        io.apply_action(target)
        if log:
            obs_list.append(np.asarray(obs))
            act_list.append(target)
        elapsed = time.perf_counter() - t0
        if dt - elapsed >= 5e-4:
            time.sleep(dt - elapsed)
    return np.asarray(obs_list), np.asarray(act_list)
