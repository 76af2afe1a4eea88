import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerobotics_tpu.algos import es


def sphere_fitness(solutions, target):
    return -jnp.sum((solutions - target) ** 2, axis=1)


TARGET = jnp.asarray(np.linspace(-0.5, 0.5, 12))


def run_solver(solver, state, gens=60, seed=0):
    rng = jax.random.key(seed)
    ask = jax.jit(solver.ask)
    tell = jax.jit(solver.tell)
    for _ in range(gens):
        rng, k = jax.random.split(rng)
        sols, state = ask(state, k)
        state = tell(state, sphere_fitness(sols, TARGET))
    return state


def test_centered_ranks():
    x = jnp.asarray([3.0, -1.0, 7.0, 2.0])
    r = np.asarray(es.compute_centered_ranks(x))
    # best gets +0.5, worst −0.5 (es.py:20-27)
    assert r[2] == 0.5
    assert r[1] == -0.5
    np.testing.assert_allclose(sorted(r), [-0.5, -1 / 6, 1 / 6, 0.5],
                               atol=1e-6)


def test_simple_ga_converges():
    solver = es.SimpleGA(12, sigma_init=0.3, sigma_decay=0.97,
                         sigma_limit=0.005, popsize=64, elite_ratio=0.1,
                         weight_decay=0.0)
    state = run_solver(solver, solver.init(), gens=120)
    best, best_r, *_ = solver.result(state)
    assert float(best_r) > -0.05, float(best_r)
    np.testing.assert_allclose(np.asarray(best), np.asarray(TARGET),
                               atol=0.25)


def test_simple_ga_reset():
    solver = es.SimpleGA(12, popsize=16)
    state = solver.init()
    state = solver.reset(state, jnp.ones(12))
    sols, state = solver.ask(state, jax.random.key(0))
    # first ask after reset centers on the reset param
    np.testing.assert_allclose(np.asarray(sols).mean(0), np.ones(12),
                               atol=0.2)


def test_open_es_converges():
    solver = es.OpenES(12, sigma_init=0.2, sigma_decay=0.999,
                       learning_rate=0.1, popsize=128, antithetic=True,
                       weight_decay=0.0)
    state = run_solver(solver, solver.init(), gens=150)
    np.testing.assert_allclose(np.asarray(state.mu), np.asarray(TARGET),
                               atol=0.15)


def test_pepg_converges():
    solver = es.PEPG(12, sigma_init=0.3, learning_rate=0.2, popsize=128,
                     weight_decay=0.0)
    state = run_solver(solver, solver.init(), gens=150)
    np.testing.assert_allclose(np.asarray(state.mu), np.asarray(TARGET),
                               atol=0.15)


def test_simple_es_converges():
    solver = es.SimpleES(12, sigma_init=0.2, popsize=128, weight_decay=0.0)
    state = run_solver(solver, solver.init(), gens=100)
    np.testing.assert_allclose(np.asarray(state.mu), np.asarray(TARGET),
                               atol=0.2)


def test_cma_es_converges():
    solver = es.CMAES(12, sigma_init=0.3, popsize=32, weight_decay=0.0)
    state = run_solver(solver, solver.init(), gens=120)
    np.testing.assert_allclose(np.asarray(state.mean), np.asarray(TARGET),
                               atol=0.05)


def test_solver_registry():
    for name, cls in es.SOLVERS.items():
        s = cls(4, popsize=8 if name != "pepg" else 8)
        st = s.init()
        sols, st = s.ask(st, jax.random.key(0))
        assert sols.shape[1] == 4
