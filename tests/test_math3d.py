import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerobotics_tpu.core import math3d


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def random_quat(rng, n=None):
    q = rng.randn(*( (n, 4) if n else (4,) ))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mat_roundtrip(rng):
    q = random_quat(rng, 32)
    m = math3d.quat_to_mat(jnp.asarray(q))
    q2 = np.asarray(math3d.mat_to_quat(m))
    # q and -q are the same rotation
    sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q * sign, q2, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = jnp.asarray(random_quat(rng, 16))
    v = jnp.asarray(rng.randn(16, 3))
    r1 = math3d.quat_rotate(q, v)
    r2 = (math3d.quat_to_mat(q) @ v[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)


def test_quat_mul_associates_with_rotation(rng):
    qa = jnp.asarray(random_quat(rng))
    qb = jnp.asarray(random_quat(rng))
    v = jnp.asarray(rng.randn(3))
    r1 = math3d.quat_rotate(math3d.quat_mul(qa, qb), v)
    r2 = math3d.quat_rotate(qa, math3d.quat_rotate(qb, v))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)


def test_euler_roundtrip(rng):
    rpy = jnp.asarray(rng.uniform(-1.0, 1.0, (32, 3)))
    q = math3d.quat_from_euler(rpy)
    rpy2 = math3d.quat_to_euler(q)
    np.testing.assert_allclose(np.asarray(rpy), np.asarray(rpy2), atol=1e-5)


def test_euler_matches_scipy(rng):
    from scipy.spatial.transform import Rotation as R
    rpy = rng.uniform(-1.0, 1.0, (8, 3))
    q = np.asarray(math3d.quat_from_euler(jnp.asarray(rpy)))
    # scipy xyzw vs our wxyz; PyBullet/scipy 'xyz' extrinsic convention
    q_sp = R.from_euler("xyz", rpy).as_quat()
    q_sp = np.concatenate([q_sp[:, 3:4], q_sp[:, :3]], axis=1)
    sign = np.sign(np.sum(q * q_sp, axis=-1, keepdims=True))
    np.testing.assert_allclose(q, q_sp * sign, atol=1e-6)


def test_quat_integrate_constant_omega(rng):
    # Integrating ω about z for t seconds yields yaw = ω t.
    q = math3d.quat_identity()
    omega = jnp.array([0.0, 0.0, 1.5])
    dt = 0.01
    for _ in range(100):
        q = math3d.quat_integrate(q, omega, dt)
    rpy = np.asarray(math3d.quat_to_euler(q))
    np.testing.assert_allclose(rpy, [0.0, 0.0, 1.5], atol=1e-4)


def test_skew(rng):
    a = jnp.asarray(rng.randn(3))
    b = jnp.asarray(rng.randn(3))
    np.testing.assert_allclose(
        np.asarray(math3d.skew(a) @ b), np.asarray(jnp.cross(a, b)), atol=1e-6)
