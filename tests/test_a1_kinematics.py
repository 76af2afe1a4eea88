import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerobotics_tpu.sim import a1_model as a1


@pytest.fixture
def rng():
    return np.random.RandomState(1)


def sample_angles(rng, n):
    """Random joint angles inside the A1 joint limits, away from the knee
    workspace boundary where IK is ill-conditioned in float32."""
    lo = np.array([-0.6, -0.5, -2.3])
    hi = np.array([0.6, 1.8, -1.1])
    return rng.uniform(lo, hi, (n, 4, 3)).reshape(n, 12)


def test_fk_default_pose_heights(rng):
    """At the default pose the feet should sit ~0.26 m below the hips."""
    pos = a1.foot_positions_in_base_frame(jnp.asarray(a1.INIT_MOTOR_ANGLES))
    pos = np.asarray(pos)
    assert pos.shape == (4, 3)
    # all feet below the base
    assert np.all(pos[:, 2] < -0.2)
    # symmetric left/right
    np.testing.assert_allclose(pos[0, 2], pos[1, 2], atol=1e-6)
    np.testing.assert_allclose(pos[2, 2], pos[3, 2], atol=1e-6)


def test_ik_fk_roundtrip(rng):
    q = sample_angles(rng, 64)
    feet = a1.foot_positions_in_base_frame(jnp.asarray(q))
    q2 = a1.joint_angles_from_foot_positions(feet)
    np.testing.assert_allclose(np.asarray(q2), q, atol=2e-2)


def test_jacobian_matches_autodiff(rng):
    q_legs = sample_angles(rng, 8).reshape(8, 4, 3)
    signs = jnp.asarray(a1.HIP_SIGNS)

    def fk_single(angles, sign):
        return a1.foot_position_in_hip_frame(angles, sign)

    J_auto = jax.vmap(jax.vmap(jax.jacobian(fk_single), in_axes=(0, 0)),
                      in_axes=(0, None))(jnp.asarray(q_legs), signs)
    J_analytic = a1.analytical_leg_jacobian(jnp.asarray(q_legs), signs)
    np.testing.assert_allclose(
        np.asarray(J_auto), np.asarray(J_analytic), atol=1e-4)


def test_reference_formula_parity(rng):
    """Cross-check against an independent numpy transcription of the
    reference closed forms (a1.py:97-129)."""
    def ref_fk(angles, l_hip_sign):
        theta_ab, theta_hip, theta_knee = angles
        l_up, l_low = 0.2, 0.2
        l_hip = 0.08505 * l_hip_sign
        leg_distance = np.sqrt(l_up**2 + l_low**2 +
                               2 * l_up * l_low * np.cos(theta_knee))
        eff_swing = theta_hip + theta_knee / 2
        off_x_hip = -leg_distance * np.sin(eff_swing)
        off_z_hip = -leg_distance * np.cos(eff_swing)
        off_y_hip = l_hip
        off_x = off_x_hip
        off_y = np.cos(theta_ab) * off_y_hip - np.sin(theta_ab) * off_z_hip
        off_z = np.sin(theta_ab) * off_y_hip + np.cos(theta_ab) * off_z_hip
        return np.array([off_x, off_y, off_z])

    q = sample_angles(rng, 4).reshape(4, 4, 3)
    for row in q:
        for leg in range(4):
            sign = a1.HIP_SIGNS[leg]
            ours = np.asarray(a1.foot_position_in_hip_frame(
                jnp.asarray(row[leg]), jnp.asarray(sign)))
            theirs = ref_fk(row[leg], sign)
            np.testing.assert_allclose(ours, theirs, atol=1e-5)
