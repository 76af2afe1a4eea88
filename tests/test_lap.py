"""Exact-LAP validation against scipy.optimize.linear_sum_assignment
(VERDICT round-1 item 6: Hungarian assignment replacing greedy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from paddlerobotics_tpu.ops import lap


@pytest.mark.parametrize("n", [2, 5, 8, 16])
def test_solve_lap_matches_scipy_cost(n):
    solve = jax.jit(lap.solve_lap)
    rng = np.random.RandomState(n)
    for trial in range(250):
        cost = rng.rand(n, n).astype(np.float32)
        col = np.asarray(solve(jnp.asarray(cost)))
        # valid permutation
        assert sorted(col.tolist()) == list(range(n))
        ours = cost[np.arange(n), col].sum()
        r, c = linear_sum_assignment(cost)
        ref = cost[r, c].sum()
        # same optimal cost (unique-optimum random instances → same perm)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)
        np.testing.assert_array_equal(col, c)


def test_solve_lap_rectangular_padding():
    rng = np.random.RandomState(0)
    cost = rng.rand(3, 7).astype(np.float32)
    a = np.asarray(lap.min_cost_match(
        jnp.asarray(cost), 10.0, jnp.ones(3), jnp.ones(7)))
    r, c = linear_sum_assignment(cost)
    np.testing.assert_array_equal(a, c)


def test_min_cost_match_threshold_filter():
    cost = jnp.asarray([[0.1, 5.0], [5.0, 0.2]])
    a = np.asarray(lap.min_cost_match(cost, 1.0, jnp.ones(2), jnp.ones(2)))
    np.testing.assert_array_equal(a, [0, 1])
    # threshold below both → no matches
    a = np.asarray(lap.min_cost_match(cost, 0.05, jnp.ones(2), jnp.ones(2)))
    np.testing.assert_array_equal(a, [-1, -1])


def test_min_cost_match_respects_validity():
    cost = jnp.zeros((3, 3))
    rows = jnp.asarray([1.0, 0.0, 1.0])
    cols = jnp.asarray([0.0, 1.0, 1.0])
    a = np.asarray(lap.min_cost_match(cost, 1.0, rows, cols))
    assert a[1] == -1
    assert set(a[[0, 2]].tolist()) <= {1, 2}
    assert a[0] != a[2]


def test_greedy_vs_hungarian_suboptimal_case():
    """The classic instance where greedy is strictly worse."""
    from paddlerobotics_tpu.hri.tracker import greedy_match
    cost = jnp.asarray([[0.0, 1.0], [0.1, 10.0]])
    g = np.asarray(greedy_match(cost, 100.0, jnp.ones(2), jnp.ones(2)))
    h = np.asarray(lap.min_cost_match(cost, 100.0, jnp.ones(2), jnp.ones(2)))
    gc = float(cost[np.arange(2), g].sum())   # greedy: 0.0 + 10.0
    hc = float(cost[np.arange(2), h].sum())   # optimal: 1.0 + 0.1
    assert hc < gc
    np.testing.assert_array_equal(h, [1, 0])
