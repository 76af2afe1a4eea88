"""Sim/robot exercise probe: drive the same action sequence through the
simulator (and, on hardware, the real A1) and log every state channel.

Rebuild of deployment/a1_robot_exercise.py:30-91 — the basic
sim-vs-real debug tool: put the robot on the rack, blend slowly to the
init pose, run a sinusoidal hip exercise, and dump
`<suffix>_obs_sin.npz` with motor_angle / motor_velocity /
foot_contact / v / imu / rpy / action traces for comparison. Here the
robot side is anything implementing the `RobotIO` protocol
(deploy/realtime.py): `SimRobotIO` is the software-in-the-loop double;
a real LCM bridge plugs into the same loop on hardware.

(The reference's shipped loop computes `angle_hip`/`angle_calf` but
then applies the constant init pose — dead variables at
a1_robot_exercise.py:62-64; this implements the evident intent and
actually applies the sinusoid.)
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from paddlerobotics_tpu.core import math3d
from paddlerobotics_tpu.sim import a1_model as a1


class ExerciseRecorder:
    """Collects the channels a1_robot_exercise.py logs (lines 52-83)."""

    def __init__(self):
        self.rows = {k: [] for k in (
            "motor_angle", "motor_velocity", "foot_contact", "v", "imu",
            "rpy", "action")}

    def record(self, state: dict, action: np.ndarray):
        self.rows["motor_angle"].append(state["q"])
        self.rows["motor_velocity"].append(state["qd"])
        self.rows["foot_contact"].append(state["foot_contact"])
        self.rows["v"].append(state["v"])
        self.rows["imu"].append(state["drpy"])
        self.rows["rpy"].append(state["rpy"])
        self.rows["action"].append(np.asarray(action))

    def save(self, path: str):
        np.savez(path, **{k: np.asarray(v) for k, v in self.rows.items()})


def read_full_state(io) -> dict:
    """Full debug state through RobotIO. SimRobotIO exposes the batched
    env state; hardware IOs return the same keys from LCM."""
    if hasattr(io, "state"):                  # SimRobotIO
        env_state = io.state
        rb = env_state.robot
        s = rb.s
        i = 0                                 # env 0 of the SIL batch
        quat = np.asarray(s.quat[:, i])
        rpy = np.asarray(math3d.quat_to_euler(jax.numpy.asarray(quat)))
        return {
            "q": np.asarray(s.q[:, i]),
            "qd": np.asarray(s.qd[:, i]),
            "foot_contact": np.asarray(
                rb.contact.foot_contact[:, i]).astype(np.float32),
            "v": np.asarray(s.v[:, i]),
            "drpy": np.asarray(s.w[:, i]),
            "rpy": rpy,
        }
    st = io.read_state()                      # protocol fallback
    return st


def run_exercise(io, steps: int = 1000, blend_steps: int = 300,
                 freq: float = 0.5, dt: float = 0.03,
                 amplitude: float = 0.2) -> ExerciseRecorder:
    """Blend to init pose, then sinusoidal hip exercise (logged)."""
    init = np.asarray(a1.INIT_MOTOR_ANGLES, np.float64)
    start = read_full_state(io)["q"].astype(np.float64)
    # slow blend to the init pose over the first 2/3 of blend_steps,
    # then hold (the reference ramps over 200 of its 300 steps,
    # a1_robot_exercise.py:42-50) — the ramp must stay gradual for any
    # blend_steps, this being a hardware-safety feature
    ramp = max(1, (2 * blend_steps) // 3)
    for t in range(blend_steps):
        blend = min(t / ramp, 1.0)
        io.apply_action((1 - blend) * start + blend * init)

    rec = ExerciseRecorder()
    for t in range(steps):
        angle_hip = init[1] + amplitude * np.sin(
            2 * np.pi * freq * 0.01 * t)
        action = init.copy()
        action[1::3] = angle_hip
        action[2::3] = -2.0 * angle_hip
        io.apply_action(action)
        rec.record(read_full_state(io), action)
    return rec


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--suffix", type=str, default="exercise")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--freq", type=float, default=0.5)
    p.add_argument("--amplitude", type=float, default=0.2)
    p.add_argument("--udp", type=str, default="",
                   help="host:port of a UDP robot bridge "
                        "(deploy/udp_bridge protocol); 'emulator' spins "
                        "a local sim-backed emulator server")
    args = p.parse_args(argv)

    import dataclasses

    from paddlerobotics_tpu.core.config import QuadrupedConfig

    server = None
    if args.udp:
        from paddlerobotics_tpu.deploy.udp_bridge import (A1EmulatorServer,
                                                          A1UdpClient)
        if args.udp == "emulator":
            server = A1EmulatorServer()
            addr = server.addr
        else:
            host, port = args.udp.rsplit(":", 1)
            addr = (host, int(port))
        io = A1UdpClient(addr, timeout=30.0)
    else:
        from paddlerobotics_tpu.deploy.realtime import SimRobotIO
        from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv

        cfg = QuadrupedConfig()
        # rack the robot, as the reference insists
        # (a1_robot_exercise.py:32-34)
        cfg = dataclasses.replace(
            cfg, sim=dataclasses.replace(cfg.sim, on_rack=True),
            etg=dataclasses.replace(cfg.etg, step_y=0.0))
        env = BatchedQuadrupedEnv(cfg, num_envs=1)
        io = SimRobotIO(env)
    rec = run_exercise(io, steps=args.steps, freq=args.freq,
                       amplitude=args.amplitude)
    if server is not None:
        server.close()
    out = f"{args.suffix}_obs_sin.npz"
    rec.save(out)
    q = np.asarray(rec.rows["motor_angle"])
    print(f"saved {out}: motor_angle {q.shape}, hip range "
          f"[{q[:, 1].min():.3f}, {q[:, 1].max():.3f}] rad")


if __name__ == "__main__":
    main()
