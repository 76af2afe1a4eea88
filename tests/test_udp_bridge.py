"""UDP robot bridge: wire-format invariants + software-in-the-loop over
a real loopback socket (the reference's RobotInterface path,
a1_robot.py:38,170-276, rebuilt as an open UDP protocol)."""

import numpy as np
import pytest

from paddlerobotics_tpu.deploy import udp_bridge as ub
from paddlerobotics_tpu.sim import a1_model as a1


def test_command_roundtrip_and_crc():
    cmd = np.arange(60, dtype=np.float32) / 7.0
    pkt = ub.pack_command(42, cmd)
    seq, out = ub.unpack_command(pkt)
    assert seq == 42
    np.testing.assert_array_equal(out, cmd)
    # flipped byte → CRC rejects
    bad = bytearray(pkt)
    bad[10] ^= 0xFF
    assert ub.unpack_command(bytes(bad)) is None
    # wrong magic → rejected
    assert ub.unpack_command(b"XXX\x01" + pkt[4:]) is None


def test_state_roundtrip():
    st = ub.pack_state(7, 130, [1, 0, 0, 0], [0.1, 0.2, 0.3],
                       [0, 0, -9.8], np.arange(12), np.arange(12) * 2,
                       np.arange(12) * 3, [0, 50, 50, 0])
    out = ub.unpack_state(st)
    assert out["seq"] == 7 and out["tick"] == 130
    np.testing.assert_allclose(out["quat_wxyz"], [1, 0, 0, 0])
    np.testing.assert_allclose(out["dq"], np.arange(12) * 2)
    np.testing.assert_allclose(out["foot_force"], [0, 50, 50, 0])


def test_position_command_layout():
    """POSITION packing must match ApplyAction's rows
    (a1_robot.py:261-266): q at 5i, kp at 5i+1, kd at 5i+3, rest 0."""
    q = np.linspace(-1, 1, 12).astype(np.float32)
    cmd = ub.position_command(q)
    np.testing.assert_array_equal(cmd[0::5], q)
    np.testing.assert_array_equal(cmd[1::5], a1.MOTOR_KP)
    np.testing.assert_array_equal(cmd[3::5], a1.MOTOR_KD)
    assert (cmd[2::5] == 0).all() and (cmd[4::5] == 0).all()
    tau = np.full(12, 3.3, np.float32)
    tc = ub.torque_command(tau)
    np.testing.assert_array_equal(tc[4::5], tau)
    assert (np.delete(tc.reshape(12, 5), 4, axis=1) == 0).all()


@pytest.fixture(scope="module")
def bridge():
    server = ub.A1EmulatorServer()
    client = ub.A1UdpClient(server.addr, timeout=30.0)
    yield server, client
    client.close()
    server.close()


def test_sil_standing_over_udp(bridge):
    """Hold the init pose over the socket: the emulated robot must stay
    upright with feet loaded, states arriving lock-step."""
    server, client = bridge
    init = np.asarray(a1.INIT_MOTOR_ANGLES, np.float32)
    seqs = []
    for _ in range(30):
        client.apply_action(init)
        st = client.read_state()
        seqs.append(st["seq"])
    # lock-step: one state per command, strictly increasing
    assert all(b > a for a, b in zip(seqs, seqs[1:]))
    assert st["tick"] == sum(1 for s in seqs) * 10 == 300
    # upright: small roll/pitch, joints near target, feet in contact
    assert np.abs(st["rpy"][:2]).max() < 0.2
    assert np.abs(st["q"] - init).max() < 0.25
    assert st["foot_contact"].sum() >= 3
    # KF velocity settled near zero for a standing robot
    assert np.linalg.norm(st["v"]) < 0.2


def test_sil_exercise_probe_over_udp(bridge):
    """cli/robot_exercise's run_exercise drives the UDP client through
    its protocol-fallback read path — the sim-vs-real debug loop
    (a1_robot_exercise.py:30-91) crossing a real socket."""
    from paddlerobotics_tpu.cli.robot_exercise import run_exercise

    server, client = bridge
    rec = run_exercise(client, steps=40, blend_steps=10, dt=0.0)
    q = np.asarray(rec.rows["motor_angle"])
    assert q.shape == (40, 12)
    # the hip sinusoid must actually appear in the robot's joints
    hip = q[:, 1]
    assert hip.max() - hip.min() > 0.1
    rpy = np.asarray(rec.rows["rpy"])
    assert np.abs(rpy[:, :2]).max() < 0.35


def test_observe_only_wake_command(bridge):
    """The all-zero wake command (a1_robot.py:171) must not step
    physics — kp=kd=0 free-fall steps would knock the robot over."""
    server, client = bridge
    t0 = client.send_command(np.zeros(60, np.float32))["tick"]
    t1 = client.send_command(np.zeros(60, np.float32))["tick"]
    assert t0 == t1
