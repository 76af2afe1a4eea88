import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerobotics_tpu.core.config import ETGConfig
from paddlerobotics_tpu.etg import fit as etg_fit
from paddlerobotics_tpu.etg import model as etg_model
from paddlerobotics_tpu.etg import oscillator


@pytest.fixture(scope="module")
def cfg():
    return ETGConfig()


def test_features_periodic(cfg):
    v0 = oscillator.update(jnp.asarray(0.1), cfg)
    v1 = oscillator.update(jnp.asarray(0.1 + cfg.T), cfg)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-5)
    assert v0.shape == (cfg.H,)
    # RBF features: positive, bounded by 1, peaked somewhere
    assert float(v0.max()) <= 1.0 + 1e-6
    assert float(v0.max()) > 0.5


def test_fit_passes_through_points(cfg):
    w, b = etg_fit.opt_with_points(cfg)
    A = etg_fit.basis_matrix(cfg)
    pts = etg_fit.prior_points(cfg)
    recon_x = np.asarray(A @ w[0] + b[0])
    recon_z = np.asarray(A @ w[2] + b[2])
    np.testing.assert_allclose(recon_x, pts[:, 0], atol=1e-3)
    np.testing.assert_allclose(recon_z, pts[:, 1], atol=1e-3)
    # y row identically zero (train.py:108)
    assert np.allclose(np.asarray(w[1]), 0)


def test_proximal_fit_stays_near_w0(cfg):
    w0, b0 = etg_fit.opt_with_points(cfg)
    pts = jnp.asarray(etg_fit.prior_points(cfg)) * 1.05
    w, b = etg_fit.opt_with_points(cfg, points=pts, w0=w0, b0=b0, lamb=100.0)
    # huge lambda → nearly unchanged
    np.testing.assert_allclose(np.asarray(w), np.asarray(w0), atol=0.05)


def test_batched_fit_matches_single(cfg):
    w0, b0 = etg_fit.opt_with_points(cfg)
    rng = np.random.RandomState(0)
    pop = jnp.asarray(etg_fit.prior_points(cfg))[None] + \
        0.01 * rng.randn(8, 6, 2)
    ws, bs = etg_fit.batched_opt_with_points(cfg, jnp.asarray(pop), w0, b0)
    w1, b1 = etg_fit.opt_with_points(cfg, points=jnp.asarray(pop[3]),
                                     w0=w0, b0=b0)
    np.testing.assert_allclose(np.asarray(ws[3]), np.asarray(w1), atol=1e-4)


def test_gait_table_properties(cfg):
    w, b = etg_fit.opt_with_points(cfg)
    table = np.asarray(etg_model.gait_table(w, b, cfg, 600))
    assert table.shape == (600, 12)
    golden = np.load(
        "/root/reference/QuadrupedalRobots/ETGRL/gait_action_list_ETG_exp.npy")
    # Behavioral parity checks vs the reference's exported gait
    # (env_test.py:54): joint-delta magnitudes in the same regime, knees and
    # hips oscillating, left/right alternating (trot).
    assert np.all(np.abs(table) < 1.5)
    # knee joints (cols 2,5,8,11) must oscillate with meaningful amplitude
    knee_std = table[:, [2, 5, 8, 11]].std(0)
    assert np.all(knee_std > 0.05), knee_std
    gold_knee_std = golden[:, [2, 5, 8, 11]].std(0)
    assert np.all(knee_std < 3 * gold_knee_std.max())
    # diagonal legs in phase: FR upper (1) vs RL upper (10) correlated
    c_diag = np.corrcoef(table[:, 1], table[:, 10])[0, 1]
    assert c_diag > 0.9
    # period matches the golden gait's (T/dt ≈ 19.23 control steps):
    # the signal at lag 19 or 20 must correlate far higher than at lag 10.
    sig = table[:, 2] - table[:, 2].mean()
    ac = np.correlate(sig, sig, mode="full")[len(sig) - 1:]
    ac /= ac[0]
    assert max(ac[19], ac[20]) > 0.9
    assert max(ac[19], ac[20]) > ac[10] + 0.3


GOLDEN_PATH = ("/root/reference/QuadrupedalRobots/ETGRL/"
               "gait_action_list_ETG_exp.npy")


def test_golden_gait_rmse(cfg_unused=None):
    """Numeric golden-trace parity: reconstruct the reference's shipped
    (600,12) gait within tight RMSE.

    The golden npy records info["ETG_act"] of a 600-step rollout with the
    (unshipped) ESStair_origin ETG params (env_test.py:51-58). We recover
    the linear readout (w, b) from the golden's foot-space curve by least
    squares on OUR basis, then regenerate the full table through OUR
    oscillator → trot pairing → stance offsets → IK pipeline. A tight
    joint-space RMSE therefore pins: the RBF basis definition, the
    diagonal-pair half-period phase structure, the per-leg stance
    constants, the leg ordering/signs, and the IK — everything except the
    (unknowable) ES-optimized control points themselves, which the fitted
    (w, b) stands in for.
    """
    from paddlerobotics_tpu.sim import a1_model as a1

    # the golden was recorded at step_y = 0.05 (env_test.py default) —
    # exactly the recovered stance; our config default is wider (+4 cm,
    # documented physics-stability deviation)
    cfg = ETGConfig(step_y=0.05)
    golden = np.load(GOLDEN_PATH)                       # (600, 12) deltas
    q = golden + a1.INIT_MOTOR_ANGLES                   # absolute angles
    # forward kinematics of leg FR (phase group A) → foot-space curve
    feet = np.asarray(jax.vmap(
        lambda qr: a1.foot_positions_in_base_frame(qr))(jnp.asarray(q)))
    delta = feet - etg_model.default_foot_positions()[None]
    xa, za = delta[:, 0, 0], delta[:, 0, 2]
    # stance-x offset of leg FR is 0 by definition; recover (w, b) jointly
    ts = np.arange(600) * cfg.dt
    V = np.asarray(oscillator.update(jnp.asarray(ts), cfg))
    A = np.concatenate([V, np.ones((600, 1))], axis=1)
    solx = np.linalg.lstsq(A, xa, rcond=None)[0]
    solz = np.linalg.lstsq(A, za, rcond=None)[0]
    w = jnp.asarray(np.stack([solx[:-1], np.zeros(cfg.H), solz[:-1]]))
    b = jnp.asarray(np.array([solx[-1], 0.0, solz[-1]]))
    table = np.asarray(etg_model.gait_table(w, b, cfg, 600))
    rmse = np.sqrt(((table - golden) ** 2).mean())
    assert rmse < 1e-4, rmse
    assert np.abs(table - golden).max() < 1e-3


def test_phase_tables_shift(cfg):
    va, vb = etg_model.phase_tables(cfg, 100)
    # vb is va shifted by half a period
    half = cfg.T / 2 / cfg.dt
    v_direct = oscillator.update(jnp.asarray(5 * cfg.dt + cfg.T / 2), cfg)
    np.testing.assert_allclose(np.asarray(vb[5]), np.asarray(v_direct),
                               atol=1e-5)


def test_asymmetric_t2_period():
    """T2 ≠ T gives a Lissajous phase curve; features stay bounded and
    periodic with period lcm(T, T2)."""
    cfg2 = ETGConfig(T=0.5, T2=0.25)
    v0 = oscillator.update(jnp.asarray(0.07), cfg2)
    v1 = oscillator.update(jnp.asarray(0.07 + 0.5), cfg2)  # lcm(0.5,0.25)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-5)
    # not periodic at T2 alone
    v2 = oscillator.update(jnp.asarray(0.07 + 0.25), cfg2)
    assert float(jnp.abs(v0 - v2).max()) > 1e-3
    # fit still interpolates the control points
    w, b = etg_fit.opt_with_points(cfg2)
    A = etg_fit.basis_matrix(cfg2)
    pts = etg_fit.prior_points(cfg2)
    np.testing.assert_allclose(np.asarray(A @ w[2] + b[2]), pts[:, 1],
                               atol=5e-3)


def test_pairing_resolution():
    """'auto' resolves per task: bound only for gallop; explicit names
    validate eagerly (envs construct with the resolved config)."""
    import dataclasses
    base = ETGConfig()
    assert base.pairing == "auto"
    assert etg_model.resolve_pairing(base, "gallop").pairing == "bound"
    assert etg_model.resolve_pairing(base, "ground").pairing == "trot"
    assert etg_model.resolve_pairing(base, "stairstair").pairing == "trot"
    forced = dataclasses.replace(base, pairing="trot")
    assert etg_model.resolve_pairing(forced, "gallop").pairing == "trot"
    with pytest.raises(ValueError, match="unknown ETG pairing"):
        etg_model.resolve_pairing(
            dataclasses.replace(base, pairing="pace"), "ground")
    np.testing.assert_array_equal(etg_model.leg_phase_group("trot"),
                                  [0, 1, 1, 0])
    np.testing.assert_array_equal(etg_model.leg_phase_group("bound"),
                                  [0, 0, 1, 1])


def test_bound_pairing_foot_deltas(cfg):
    """Bound pairing: front legs (FR,FL) share the phase-0 readout and
    rear legs (RR,RL) the half-period one, instead of diagonals."""
    import dataclasses
    w, b = etg_fit.opt_with_points(cfg)
    v_a = oscillator.update(jnp.asarray(0.07), cfg)
    v_b = oscillator.update(jnp.asarray(0.07 + cfg.T / 2), cfg)
    trot = dataclasses.replace(cfg, pairing="trot")
    bound = dataclasses.replace(cfg, pairing="bound")
    d_t = np.asarray(etg_model.foot_deltas(w, b, v_a, v_b, trot))
    d_b = np.asarray(etg_model.foot_deltas(w, b, v_a, v_b, bound))
    # phase-group-0 legs identical across pairings: FR in both
    np.testing.assert_allclose(d_b[0], d_t[0], atol=1e-6)
    # bound: FL joins FR's phase (z-delta equal), RL joins RR
    np.testing.assert_allclose(d_b[1, 2], d_b[0, 2], atol=1e-6)
    np.testing.assert_allclose(d_b[3, 2], d_b[2, 2], atol=1e-6)
    # trot pairs diagonals instead (FR==RL), and the two phases differ
    np.testing.assert_allclose(d_t[3, 2], d_t[0, 2], atol=1e-6)
    assert abs(d_t[1, 2] - d_t[0, 2]) > 1e-4
