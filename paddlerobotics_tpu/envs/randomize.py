"""Domain randomization: normalized params → physical DynamicsParams.

`param2dynamic` reproduces the reference's mapping exactly
(ETGRL/train.py:112-126, duplicated at env_test.py:14-28,
BCtrain.py:61-75, Dynamic_parallel_model.py:14-27): a [-1,1]⁴⁸ vector
becomes control latency 0–80 ms, foot friction 0–20, base mass 0.5–3×,
base/leg inertia scales 0.1–3×, motor kp 20–200 / kd 0–5, and a gravity
perturbation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from paddlerobotics_tpu.sim.dynamics import DynamicsParams

NUM_DYNAMIC_PARAMS = 48


def param2dynamic(params: jnp.ndarray) -> DynamicsParams:
    """[-1,1]^45 or ^48 normalized vector → DynamicsParams (train.py:112-126)."""
    p = jnp.clip(params, -1.0, 1.0)
    latency_ms = jnp.clip(40.0 + 10.0 * p[0], 0.0, 80.0)
    friction = jnp.clip(0.2 + 10.0 * p[1], 0.0, 20.0)
    basemass = jnp.clip(1.5 + 1.0 * p[2], 0.5, 3.0)
    baseinertia = jnp.clip(1.0 + p[3:6], 0.1, 3.0)
    legmass = jnp.clip(1.0 + p[6:9], 0.1, 3.0)
    leginertia = jnp.clip(1.0 + p[9:21], 0.1, 3.0).reshape(4, 3)
    kp = jnp.clip(80.0 + 40.0 * p[21:33], 20.0, 200.0)
    kd_base = jnp.asarray([1.0, 2.0, 2.0] * 4)
    kd = jnp.clip(kd_base + p[33:45] * jnp.asarray([1.0, 2.0, 2.0] * 4),
                  0.0, 5.0)
    if params.shape[-1] > 45:
        gravity = jnp.clip(
            jnp.asarray([0.0, 0.0, -10.0]) + p[45:48] * jnp.asarray([2.0, 2.0, 10.0]),
            jnp.asarray([-5.0, -5.0, -20.0]), jnp.asarray([5.0, 5.0, -4.0]))
    else:
        gravity = jnp.asarray([0.0, 0.0, -9.8])
    # The reference's "basemass" acts as a scale on chassis mass; friction
    # multiplies the lateral friction coefficient.
    return DynamicsParams(
        base_mass_scale=basemass / 1.5,
        base_inertia_scale=baseinertia,
        leg_mass_scale=legmass,
        leg_inertia_scale=leginertia,
        motor_kp=kp,
        motor_kd=kd,
        foot_friction=friction / 0.6,   # reference default lateral friction
        control_latency=latency_ms / 1000.0,
        gravity=gravity,
        external_force=jnp.zeros(3),
    )


def sample_dynamics(rng: jax.Array, enable: bool = True,
                    scale: float = 1.0,
                    jitter: bool = False) -> DynamicsParams:
    """Sample randomized dynamics (Random_Param_Dict['random_dynamics']).

    `scale` is the curriculum knob: the PHYSICAL interpolation between
    the nominal dynamics (DynamicsParams.default — μ 0.6, 2 ms latency,
    kp 100) at 0 and a full reference draw (param2dynamic of a
    uniform [-1,1]⁴⁸ vector, train.py:112-126) at 1.

    Round-2 scaled the NORMALIZED vector instead — but the reference
    mapping's center p=0 is NOT nominal (friction 0.2 ≈ ice, latency
    40 ms, kp 80), so a small scale concentrated every draw at a harsh
    operating point rather than easing in from learnable physics; on
    stairs that flatlined the whole curriculum (the round-3 feasibility
    probes measured 0 open-loop survival at the old scale-0.6 stairs
    distribution). At scale=1 the two definitions coincide — the
    round-2 full-range results are unaffected."""
    if not enable:
        return DynamicsParams.default()
    if jitter:
        # Per-draw scale ~ U(0, scale) (ADR boundary-sampling style):
        # at any curriculum stage a fraction of envs stays near-nominal,
        # so the replay never loses walking transitions. On stairs this
        # is load-bearing: even scale 0.2 moves the open-loop gait from
        # walking to stalled in 99% of draws (survive 0.835 / walk
        # 0.007, scripts_dev/dr_feasibility_probe.py stairstair 0.2).
        rng, ks = jax.random.split(rng)
        scale = scale * jax.random.uniform(ks, ())
    p = jax.random.uniform(rng, (NUM_DYNAMIC_PARAMS,), minval=-1.0,
                           maxval=1.0)
    drawn = param2dynamic(p)
    nominal = DynamicsParams.default()
    return jax.tree.map(lambda d, r: d + scale * (r - d), nominal, drawn)


def dynamics_to_normalized(dyn) -> jnp.ndarray:
    """Invert `param2dynamic`: physical params → the normalized [-1,1]⁴⁸
    echo vector (the SENSOR_MODE["dynamic_vec"] observation,
    train.py:268). Exact wherever the forward map didn't clip; clipped
    coordinates saturate at ±1.

    Works on both the per-env `DynamicsParams` (leading shapes) and the
    batch-minor `BDynParams` (trailing (B,) axis): scalars are lifted to a
    length-1 leading axis and per-motor constants broadcast over any
    trailing batch dims, so the result is (48,) or (48, B).
    """
    lead = lambda x: jnp.reshape(x, (1,) + jnp.shape(x))
    li = dyn.leg_inertia_scale
    li12 = jnp.reshape(li, (12,) + jnp.shape(li)[2:])
    extra = lambda ref: (1,) * (li12.ndim - 1)
    kd_base = jnp.asarray([1.0, 2.0, 2.0] * 4).reshape((12,) + extra(None))
    g_base = jnp.asarray([0.0, 0.0, -10.0]).reshape((3,) + extra(None))
    g_scale = jnp.asarray([2.0, 2.0, 10.0]).reshape((3,) + extra(None))
    rows = [
        lead((dyn.control_latency * 1000.0 - 40.0) / 10.0),
        lead((dyn.foot_friction * 0.6 - 0.2) / 10.0),
        lead(dyn.base_mass_scale * 1.5 - 1.5),
        dyn.base_inertia_scale - 1.0,
        dyn.leg_mass_scale - 1.0,
        li12 - 1.0,
        (dyn.motor_kp - 80.0) / 40.0,
        (dyn.motor_kd - kd_base) / kd_base,
        (dyn.gravity - g_base) / g_scale,
    ]
    return jnp.clip(jnp.concatenate(rows, axis=0), -1.0, 1.0)


def sample_push_force(rng: jax.Array, max_force: float) -> jnp.ndarray:
    """Random horizontal push on the trunk (Random_Param_Dict['random_force'])."""
    d = jax.random.normal(rng, (2,))
    d = d / (jnp.linalg.norm(d) + 1e-6)
    mag = jax.random.uniform(rng, ()) * max_force
    return jnp.concatenate([mag * d, jnp.zeros(1)])
