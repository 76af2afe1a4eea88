"""UDP low-level robot bridge: the RobotIO protocol over a real socket.

The reference drives hardware through the Unitree SDK's compiled
``RobotInterface`` (a1_robot.py:38,170-171): 60-float low-level motor
commands out (``[q, kp, dq, kd, tau] × 12`` — the layout ApplyAction
packs at a1_robot.py:261-273), IMU/motor/foot state back
(ReceiveObservation, a1_robot.py:179-198). The SDK's wire encoding is
proprietary; this module rebuilds the *bridge* as an open, documented
UDP protocol with the same payload semantics, so the deployment stack
crosses a real network boundary instead of an in-process double:

    A1UdpClient (RobotIO) ──UDP──► A1EmulatorServer (sbatch physics)

- **Command packet** (252 B): ``b'A1C' ver=1 | u32 seq | 60×f32 |
  u32 crc32``. Rows per motor i: ``cmd[5i]=q_des, [5i+1]=kp,
  [5i+2]=qd_des, [5i+3]=kd, [5i+4]=tau_ff`` — POSITION fills q/kp/kd,
  TORQUE fills tau only, HYBRID fills all five, exactly the reference's
  three ApplyAction branches. The all-zero command is the SDK's wake
  handshake (a1_robot.py:171) and is treated as *observe-only*.
- **State packet** (220 B): ``b'A1S' ver=1 | u32 seq | u32 tick |
  quat wxyz 4f | gyro 3f | accel 3f | q 12f | dq 12f | tau_est 12f |
  foot_force 4f | u32 crc32`` — the LowState fields ReceiveObservation
  and the velocity estimator consume.

The client is lock-step (each command solicits one state reply), which
mirrors the paced control loop's step-synchronized IO; `read_state`
returns the reference's derived channels (xyzw quat conversion as
a1_robot.py:190-192, rpy/drpy, KF velocity via deploy/estimator).

On hardware this same client talks to a thin adapter that re-encodes
the datagrams into the vendor SDK — everything above the socket is
exercised here in software-in-the-loop tests (tests/test_udp_bridge.py).
"""

from __future__ import annotations

import dataclasses
import socket
import struct
import threading
import zlib

import numpy as np

CMD_MAGIC = b"A1C\x01"
STATE_MAGIC = b"A1S\x01"
NUM_MOTORS = 12
_CMD_BODY = struct.Struct("<I60f")
_STATE_BODY = struct.Struct("<II50f")
STATE_FLOATS = 50        # quat4 + gyro3 + acc3 + q12 + dq12 + tau12 + foot4


def _frame(magic: bytes, body: bytes) -> bytes:
    blob = magic + body
    return blob + struct.pack("<I", zlib.crc32(blob))


def _unframe(magic: bytes, pkt: bytes) -> bytes | None:
    if len(pkt) < len(magic) + 4 or not pkt.startswith(magic):
        return None
    blob, (crc,) = pkt[:-4], struct.unpack("<I", pkt[-4:])
    if zlib.crc32(blob) != crc:
        return None
    return blob[len(magic):]


def pack_command(seq: int, cmd60: np.ndarray) -> bytes:
    cmd60 = np.asarray(cmd60, np.float32)
    assert cmd60.shape == (60,), cmd60.shape
    return _frame(CMD_MAGIC, _CMD_BODY.pack(seq & 0xFFFFFFFF,
                                            *cmd60.tolist()))


def unpack_command(pkt: bytes):
    body = _unframe(CMD_MAGIC, pkt)
    if body is None or len(body) != _CMD_BODY.size:
        return None
    vals = _CMD_BODY.unpack(body)
    return vals[0], np.asarray(vals[1:], np.float32)


def pack_state(seq: int, tick: int, quat_wxyz, gyro, accel, q, dq,
               tau_est, foot_force) -> bytes:
    flat = np.concatenate([
        np.asarray(quat_wxyz, np.float32).ravel(),
        np.asarray(gyro, np.float32).ravel(),
        np.asarray(accel, np.float32).ravel(),
        np.asarray(q, np.float32).ravel(),
        np.asarray(dq, np.float32).ravel(),
        np.asarray(tau_est, np.float32).ravel(),
        np.asarray(foot_force, np.float32).ravel()])
    assert flat.shape == (STATE_FLOATS,), flat.shape
    return _frame(STATE_MAGIC, _STATE_BODY.pack(
        seq & 0xFFFFFFFF, tick & 0xFFFFFFFF, *flat.tolist()))


def unpack_state(pkt: bytes) -> dict | None:
    body = _unframe(STATE_MAGIC, pkt)
    if body is None or len(body) != _STATE_BODY.size:
        return None
    vals = _STATE_BODY.unpack(body)
    f = np.asarray(vals[2:], np.float32)
    return {"seq": vals[0], "tick": vals[1], "quat_wxyz": f[0:4],
            "gyro": f[4:7], "accel": f[7:10], "q": f[10:22],
            "dq": f[22:34], "tau_est": f[34:46], "foot_force": f[46:50]}


def position_command(q_des, kp=None, kd=None) -> np.ndarray:
    """POSITION branch of ApplyAction (a1_robot.py:261-266)."""
    from paddlerobotics_tpu.sim import a1_model as a1

    cmd = np.zeros(60, np.float32)
    cmd[0::5] = np.asarray(q_des, np.float32)
    cmd[1::5] = np.asarray(a1.MOTOR_KP if kp is None else kp, np.float32)
    cmd[3::5] = np.asarray(a1.MOTOR_KD if kd is None else kd, np.float32)
    return cmd


def torque_command(tau) -> np.ndarray:
    """TORQUE branch (a1_robot.py:267-269): feed-forward only."""
    cmd = np.zeros(60, np.float32)
    cmd[4::5] = np.asarray(tau, np.float32)
    return cmd


class A1UdpClient:
    """RobotIO over the UDP protocol (lock-step command→state).

    `read_state()` returns the derived channels the deployment stack
    consumes — quat converted wxyz→xyzw (a1_robot.py:190-192), rpy,
    drpy (gyro), q, qd, foot_contact, and the Kalman-filtered base
    velocity (deploy/estimator = a1_robot_velocity_estimator rebuild).
    """

    def __init__(self, addr, timeout: float = 2.0, dt: float = 0.026):
        self.addr = addr
        self.dt = dt
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.settimeout(timeout)
        self.seq = 0
        self._last: dict | None = None
        from paddlerobotics_tpu.deploy import estimator

        self._est = estimator.estimator_init()
        self._vel = np.zeros(3, np.float32)
        # SDK wake handshake: one zero command (a1_robot.py:171)
        self.send_command(np.zeros(60, np.float32))

    # -- low level -------------------------------------------------------
    def send_command(self, cmd60: np.ndarray) -> dict:
        self.seq += 1
        self.sock.sendto(pack_command(self.seq, cmd60), self.addr)
        while True:
            pkt, _ = self.sock.recvfrom(4096)
            st = unpack_state(pkt)
            if st is not None and st["seq"] == self.seq:
                break
        self._last = st
        self._update_estimator(st)
        return st

    def _update_estimator(self, st: dict) -> None:
        import jax.numpy as jnp

        from paddlerobotics_tpu.deploy import estimator

        contacts = st["foot_force"] > 5.0
        vel, self._est = estimator.estimator_update(
            self._est, jnp.asarray(st["accel"]), jnp.asarray(st["q"]),
            jnp.asarray(st["dq"]), jnp.asarray(contacts), self.dt)
        self._vel = np.asarray(vel, np.float32)

    # -- RobotIO ----------------------------------------------------------
    def apply_action(self, joint_targets: np.ndarray) -> None:
        self.send_command(position_command(joint_targets))

    def read_state(self) -> dict:
        from paddlerobotics_tpu.core import math3d
        import jax.numpy as jnp

        if self._last is None:
            self.send_command(np.zeros(60, np.float32))
        st = self._last
        qw = st["quat_wxyz"]
        quat_xyzw = np.asarray([qw[1], qw[2], qw[3], qw[0]], np.float32)
        rpy = np.asarray(math3d.quat_to_euler(jnp.asarray(qw)), np.float32)
        return {"q": st["q"], "qd": st["dq"], "quat": quat_xyzw,
                "rpy": rpy, "drpy": st["gyro"],
                "foot_contact": (st["foot_force"] > 5.0).astype(np.float32),
                "v": self._vel, "seq": st["seq"], "tick": st["tick"]}

    def close(self) -> None:
        self.sock.close()


class A1EmulatorServer:
    """Sim-backed robot on the far end of the socket.

    Each non-zero command steps one control step of the batched physics
    (sim/sbatch.control_step, B=1) with the packet's kp/kd/tau — the
    HYBRID PD law covers all three reference motor modes (kp=kd=0 +
    tau ≡ TORQUE; tau=qd=0 ≡ POSITION). The all-zero wake command is
    observe-only. Replies one state packet per command (lock-step).
    """

    def __init__(self, sim_cfg=None, height: float = 0.32,
                 host: str = "127.0.0.1"):
        import jax
        import jax.numpy as jnp

        from paddlerobotics_tpu.core.config import SimConfig, TaskConfig
        from paddlerobotics_tpu.sim import sbatch, terrain

        self.cfg = sim_cfg or SimConfig()
        self.h_fn = terrain.height_fn(TaskConfig())
        self.rb = sbatch.init_robot(1, height=height)
        self.params = sbatch.BDynParams.default(1)
        self.tick = 0

        def step(rb, p, q_des, qd_des, tau_ff):
            return sbatch.control_step(
                rb, q_des[:, None], p, self.cfg, self.h_fn,
                qd_ref=qd_des[:, None], tau_ff=tau_ff[:, None])

        self._step = jax.jit(step)
        self._jnp = jnp
        # compile before serving: the first control_step build takes
        # seconds-to-minutes, far beyond any sane client socket timeout
        z = jnp.zeros(12)
        jax.block_until_ready(self._step(self.rb, self.params,
                                         jnp.asarray(self.rb.s.q[:, 0]),
                                         z, z))

        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind((host, 0))
        self.addr = self.sock.getsockname()
        self._stop = False
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self) -> None:
        while not self._stop:
            try:
                pkt, peer = self.sock.recvfrom(4096)
            except OSError:
                return
            parsed = unpack_command(pkt)
            if parsed is None:
                continue        # bad magic/CRC: drop, like lossy UDP
            seq, cmd = parsed
            if np.any(cmd != 0.0):
                self._apply(cmd)
            self.sock.sendto(self._state_packet(seq), peer)

    def _apply(self, cmd: np.ndarray) -> None:
        jnp = self._jnp
        q_des, kp, qd_des, kd, tau = (cmd[0::5], cmd[1::5], cmd[2::5],
                                      cmd[3::5], cmd[4::5])
        self.params = self.params._replace(
            motor_kp=jnp.asarray(kp)[:, None],
            motor_kd=jnp.asarray(kd)[:, None])
        self.rb = self._step(self.rb, self.params, jnp.asarray(q_des),
                             jnp.asarray(qd_des), jnp.asarray(tau))
        self.tick += self.cfg.action_repeat

    def _state_packet(self, seq: int) -> bytes:
        s = self.rb.s
        foot = (np.asarray(self.rb.contact.foot_contact[:, 0], np.float32)
                * 50.0)  # nominal stance load per foot, N
        return pack_state(
            seq, self.tick, np.asarray(s.quat[:, 0]),
            np.asarray(s.w[:, 0]), np.zeros(3, np.float32),
            np.asarray(s.q[:, 0]), np.asarray(s.qd[:, 0]),
            np.asarray(self.rb.tau[:, 0]), foot)

    def close(self) -> None:
        self._stop = True
        try:
            self.sock.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self.sock.close()
        self._thread.join(timeout=2.0)
