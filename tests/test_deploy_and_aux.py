import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerobotics_tpu.core.config import (ESConfig, QuadrupedConfig,
                                            ETGConfig, TaskConfig,
                                            TrainConfig)
from paddlerobotics_tpu.deploy import bezier, estimator, policy_export


def test_bezier_swing_endpoints():
    """Swing starts and ends at z≈0, peaks near mid-phase."""
    L = jnp.asarray(0.05)
    x0, y0, z0 = bezier.bezier_swing(jnp.asarray(0.0), L, 0.0, 0.05)
    x1, y1, z1 = bezier.bezier_swing(jnp.asarray(1.0), L, 0.0, 0.05)
    xm, ym, zm = bezier.bezier_swing(jnp.asarray(0.5), L, 0.0, 0.05)
    assert abs(float(z0)) < 1e-6 and abs(float(z1)) < 1e-6
    assert float(zm) > 0.03
    # swing moves foot from −L to +L
    assert float(x0) < 0 < float(x1)


def test_bezier_stance_drag():
    L = jnp.asarray(0.05)
    x0, _, _ = bezier.sine_stance(jnp.asarray(0.0), L, 0.0, 0.01)
    x1, _, z1 = bezier.sine_stance(jnp.asarray(1.0), L, 0.0, 0.01)
    assert float(x0) > 0 > float(x1)   # drag back during stance


def test_bezier_trajectory_ticks():
    from paddlerobotics_tpu.etg.model import default_foot_positions

    feet0 = jnp.asarray(default_foot_positions())
    state = bezier.init_state()
    stepper = bezier.stepper_init()
    for _ in range(20):
        stepper = bezier.stepper_ramp(stepper, 0.04, 0.5)
        feet, state = bezier.generate_trajectory(
            state, feet0, stepper.step_length, stepper.lateral_fraction,
            stepper.yaw_rate, stepper.step_velocity, dt=0.01)
    assert feet.shape == (4, 3)
    assert np.all(np.isfinite(np.asarray(feet)))
    # feet stay near defaults
    assert float(jnp.abs(feet - feet0).max()) < 0.15


def test_moving_window_mean():
    s = estimator.window_init(4, 2)
    means = []
    for i in range(6):
        mean, s = estimator.window_update(s, jnp.asarray([float(i), 0.0]))
        means.append(float(mean[0]))
    # window of last 4 of [0..5] → mean 3.5
    np.testing.assert_allclose(means[-1], 3.5, atol=1e-5)


def test_velocity_estimator_tracks_leg_odometry():
    """Still accelerometer + constant leg-swing velocity → estimate
    converges toward −J q̇ observation."""
    s = estimator.estimator_init(window_size=10)
    q = jnp.asarray(np.array([0, 0.9, -1.8] * 4))
    qd = jnp.zeros(12).at[1].set(1.0)  # FR hip pitch swinging
    contacts = jnp.asarray([True, True, True, True])
    for _ in range(50):
        mean, s = estimator.estimator_update(
            s, jnp.zeros(3), q, qd, contacts, dt=0.01)
    # foot moves backward-ish ⇒ body velocity estimate nonzero, finite
    assert np.all(np.isfinite(np.asarray(mean)))
    assert float(jnp.abs(s.estimate).max()) > 0.01


def test_policy_export_and_sim_loop():
    from paddlerobotics_tpu.algos.sac import SAC
    from paddlerobotics_tpu.core.config import SACConfig
    from paddlerobotics_tpu.deploy.realtime import SimRobotIO, \
        run_control_loop
    from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv
    import dataclasses

    cfg = QuadrupedConfig()
    w_b = policy_export.export_gait_table(cfg, *_default_etg(cfg), 100)
    assert w_b.shape == (100, 12)

    sac = SAC(49, 12, SACConfig())
    sac_state = sac.init(jax.random.key(0))
    policy = policy_export.export_policy_fn(
        sac, sac_state, w_b, np.full(12, 0.3))
    out = policy(jnp.zeros(49), jnp.asarray(3))
    assert out.shape == (12,)

    # software-in-the-loop: drive one sim env at "real-time" pace
    sil_cfg = dataclasses.replace(
        cfg, etg=dataclasses.replace(cfg.etg, step_y=0.0))
    env = BatchedQuadrupedEnv(sil_cfg, num_envs=1)
    io = SimRobotIO(env)
    obs_log, act_log = run_control_loop(policy, io, dt=0.001, max_time=0.02)
    assert obs_log.shape[0] == 20


def _default_etg(cfg):
    from paddlerobotics_tpu.etg import fit as etg_fit

    return etg_fit.opt_with_points(cfg.etg)


def test_pretrainer_smoke():
    from paddlerobotics_tpu.train.pretrain import ETGPretrainer

    cfg = QuadrupedConfig(es=ESConfig(popsize=4))
    t = ETGPretrainer(cfg, num_envs=8, outdir="/tmp/pretrain_test")
    best, best_r, (w, b) = t.train(generations=2, episode_len=10)
    assert best.shape == (12,)
    assert np.isfinite(best_r)


def test_shipped_etg_seeds_survive_openloop():
    """Every shipped per-task seed npz must load and keep the robot
    alive open-loop at nominal dynamics on its own terrain (the health
    gate scripts_dev/gen_seeds.py enforces at generation time)."""
    from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv
    from paddlerobotics_tpu.etg import fit as etg_fit
    from paddlerobotics_tpu.etg import seeds as etg_seeds

    tasks = etg_seeds.available()
    assert tasks, "seed library is empty — regenerate via scripts_dev/gen_seeds.py"
    B, steps = 4, 150
    for mode in tasks:
        param = etg_seeds.load_seed_param(mode)
        assert param is not None and param.shape == (12,)
        cfg = QuadrupedConfig(task=TaskConfig(task_mode=mode))
        w0, b0 = etg_fit.opt_with_points(cfg.etg)
        w, b = etg_fit.opt_with_points(
            cfg.etg, points=etg_fit.prior_points(cfg.etg) + param.reshape(6, 2),
            w0=w0, b0=b0)
        env = BatchedQuadrupedEnv(cfg, num_envs=B)
        st, _ = jax.jit(env.reset)(
            jax.random.key(0),
            etg_w=jnp.broadcast_to(jnp.asarray(w)[..., None], w.shape + (B,)),
            etg_b=jnp.broadcast_to(jnp.asarray(b)[..., None], (3, B)))

        def body(c, _):
            st, alive = c
            ns, _, _, done, _ = env.step(st, jnp.zeros((B, 12)),
                                         autoreset=False)
            return (ns, alive * (1.0 - done.astype(jnp.float32))), None

        (_, alive), _ = jax.jit(lambda c: jax.lax.scan(
            body, c, None, length=steps))((st, jnp.ones(B)))
        assert float(jnp.mean(alive)) == 1.0, f"{mode} seed falls open-loop"


def test_dynamics_id_recovers_hidden_params():
    """Recoverability, not smoke: traces generated by the sim itself
    under a HIDDEN 48-param draw (+ measurement noise) must be matched
    by the ES loop far better than the nominal parameters match them —
    the sim2real identification claim of Dynamic_parallel_model.py:
    29-41,152-182 demonstrated end to end (full study:
    scripts_dev/dynid_study.py → docs/dynid_study.md)."""
    import dataclasses

    from paddlerobotics_tpu.envs import randomize
    from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv
    from paddlerobotics_tpu.sim.sbatch import BDynParams
    from paddlerobotics_tpu.train.dynamics_id import (DynamicsIdentifier,
                                                      generate_trace)

    base = QuadrupedConfig()
    cfg = dataclasses.replace(
        base, sim=dataclasses.replace(
            base.sim, obs_latency_taps=base.sim.latency_buffer_len))
    T = 40
    hidden48 = np.asarray(jax.random.uniform(
        jax.random.key(5), (48,), minval=-1.0, maxval=1.0)) * 0.5
    hidden_dyn = BDynParams.from_leading(
        jax.vmap(randomize.param2dynamic)(jnp.asarray(hidden48)[None]))

    # open-loop gait = the default ETG's joint trajectory
    env1 = BatchedQuadrupedEnv(cfg, 1)
    w, b = env1.default_etg()
    gait = jax.vmap(lambda t: env1._etg_residual(
        w, b, jnp.full((1,), t, jnp.int32))[0][:, 0])(jnp.arange(T))

    q, g = generate_trace(env1, gait, hidden_dyn, jax.random.key(1),
                          noise_q=0.01, noise_gyro=0.05)
    ident = DynamicsIdentifier(cfg, gait, q[:, 0], g[:, 0], popsize=16,
                               sigma=0.5, outdir="/tmp/dynid_test")
    best, dyn = ident.identify(epochs=8, seed=0)
    assert best.shape == (48,)
    losses = np.asarray(ident.score(jnp.stack(
        [jnp.asarray(best), jnp.zeros(48), jnp.asarray(hidden48)])))
    ident_loss, nominal_loss, true_loss = losses
    # the true params reach (near) the noise floor; the identified draw
    # must land well below nominal — it actually identified something
    assert np.isfinite(ident_loss)
    assert ident_loss < 0.6 * nominal_loss, (ident_loss, nominal_loss)
    assert true_loss < nominal_loss


def test_cli_parses():
    from paddlerobotics_tpu.cli.train_quadruped import build_parser, \
        config_from_args

    args = build_parser().parse_args(
        ["--task_mode", "ground", "--num_envs", "16", "--torso", "2.0"])
    cfg = config_from_args(args)
    assert cfg.reward.torso == 2.0
    assert cfg.task.task_mode == "ground"


def test_cli_task_preset_defaults():
    """TASK_PRESETS become CLI defaults; explicit flags still win."""
    from paddlerobotics_tpu.cli.train_quadruped import (apply_task_preset,
                                                        build_parser)

    p = build_parser()
    apply_task_preset(p, ["--task_mode", "up_slope"])
    a = p.parse_args(["--task_mode", "up_slope"])
    assert (a.num_envs, a.updates_per_step, a.warmup_steps,
            a.ln_critic) == (1024, 16, 200_000, 1)

    p = build_parser()
    apply_task_preset(p, ["--task_mode=balance_beam", "--step_y", "0.07"])
    a = p.parse_args(["--task_mode=balance_beam", "--step_y", "0.07"])
    assert a.step_y == 0.07          # explicit flag wins
    # shipped round-4 beam preset: keep_best_eval + LN critic, NO
    # critic reset (docs/task_matrix.md "round-4 close")
    assert a.keep_best_eval == 1
    assert a.ln_critic is True or a.ln_critic == 1
    assert a.critic_reset_steps == 0

    p = build_parser()
    apply_task_preset(p, ["--task_mode", "ground"])
    a = p.parse_args(["--task_mode", "ground"])
    assert a.num_envs == 4096        # no preset → parser defaults


def test_obs_history_wrapper():
    from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv
    from paddlerobotics_tpu.envs.wrappers import ObsHistoryWrapper

    env = BatchedQuadrupedEnv(QuadrupedConfig(), num_envs=2)
    wrap = ObsHistoryWrapper(env, time_steps=3, time_interval=1,
                             mode="stack")
    assert wrap.obs_dim == 49 * 4
    state, obs = wrap.reset(jax.random.key(0))
    assert obs.shape == (2, 49 * 4)
    state, obs, rew, done, info = wrap.step(state, jnp.zeros((2, 12)))
    assert obs.shape == (2, 49 * 4)

    gru = ObsHistoryWrapper(env, time_steps=3, mode="GRU")
    state, obs = gru.reset(jax.random.key(0))
    assert obs.shape == (2, 4, 49)


def test_render_frame():
    from paddlerobotics_tpu.deploy.visualize import render_frame

    frame = render_frame(np.array([0.0, 0.0, 0.27]),
                         np.array([1.0, 0, 0, 0]),
                         np.array([0, 0.9, -1.8] * 4))
    assert frame.shape == (480, 640, 3)
    assert frame.dtype == np.uint8
    # not blank
    assert frame.std() > 5


def test_robot_exercise_probe(tmp_path):
    """Sim/robot exercise tool (a1_robot_exercise.py equivalent): blend
    to init pose on the rack, sinusoidal hip exercise, npz trace with
    the reference's channel names."""
    import dataclasses

    from paddlerobotics_tpu.cli.robot_exercise import (read_full_state,
                                                       run_exercise)
    from paddlerobotics_tpu.core.config import QuadrupedConfig
    from paddlerobotics_tpu.deploy.realtime import SimRobotIO
    from paddlerobotics_tpu.envs.batched_env import BatchedQuadrupedEnv
    from paddlerobotics_tpu.sim import a1_model as a1

    cfg = QuadrupedConfig()
    cfg = dataclasses.replace(
        cfg, sim=dataclasses.replace(cfg.sim, on_rack=True),
        etg=dataclasses.replace(cfg.etg, step_y=0.0))
    env = BatchedQuadrupedEnv(cfg, num_envs=1)
    io = SimRobotIO(env)

    rec = run_exercise(io, steps=120, blend_steps=40, freq=2.0)
    out = str(tmp_path / "probe_obs_sin.npz")
    rec.save(out)

    data = np.load(out)
    assert set(data.files) == {"motor_angle", "motor_velocity",
                               "foot_contact", "v", "imu", "rpy",
                               "action"}
    q = data["motor_angle"]
    assert q.shape == (120, 12)
    # the sinusoid actually moves the hips around the init angle
    init_hip = float(np.asarray(a1.INIT_MOTOR_ANGLES)[1])
    assert q[:, 1].max() > init_hip + 0.05
    assert q[:, 1].min() < init_hip - 0.05
    # tracking: commanded vs measured hip within PD tracking error
    cmd = data["action"][:, 1]
    assert np.abs(cmd - q[:, 1]).mean() < 0.15
    # on the rack the base must not translate
    assert np.abs(data["v"]).max() < 1e-3
