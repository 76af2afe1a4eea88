"""Exact linear assignment (Hungarian) as a jittable JAX program.

Replaces the round-1 greedy matcher in the Deep-SORT tracker with the
true minimum-cost assignment the reference uses
(HRI/TFVT_HRI/perception/tracker/utils.py min_cost_matching →
sklearn/scipy linear_assignment). Algorithm: successive shortest
augmenting paths with dual potentials (the textbook O(n³) method scipy's
`linear_sum_assignment` also implements) — every data structure is a
fixed-shape array, the Dijkstra search and the augmentation are
`lax.while_loop`s, so the whole solve jits, vmaps, and nests inside the
tracker's `lax.fori_loop` cascade.

Validated against scipy.optimize.linear_sum_assignment on random
matrices (tests/test_lap.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = jnp.float32(1e18)


def solve_lap(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact min-cost perfect assignment on a square (n,n) matrix.

    Returns col_for_row (n,) int32 — a permutation minimizing
    sum_i cost[i, col_for_row[i]]. All entries must be finite.
    """
    n = cost.shape[0]
    cost = cost.astype(jnp.float32)

    def assign_row(carry, cur_row):
        u, v, row4col, col4row = carry

        # --- Dijkstra over the equality graph from cur_row ---------------
        shortest = jnp.full((n,), BIG)
        path = jnp.full((n,), cur_row, jnp.int32)   # predecessor row per col
        remaining = jnp.ones((n,), bool)            # cols not yet scanned
        sr = jnp.zeros((n,), bool)                  # scanned rows

        def cond(s):
            return s[0] < 0

        def body(s):
            sink, min_val, i, shortest, path, remaining, sr = s
            sr = sr.at[i].set(True)
            # relax all remaining cols through row i
            r = min_val + cost[i] - u[i] - v
            better = remaining & (r < shortest)
            shortest = jnp.where(better, r, shortest)
            path = jnp.where(better, i, path)
            d = jnp.where(remaining, shortest, BIG)
            j = jnp.argmin(d)
            min_val = d[j]
            remaining = remaining.at[j].set(False)
            i_next = row4col[j]
            sink = jnp.where(i_next < 0, j, jnp.int32(-1))
            i = jnp.where(i_next < 0, i, i_next)
            return (sink, min_val, i, shortest, path, remaining, sr)

        init = (jnp.int32(-1), jnp.float32(0.0), cur_row,
                shortest, path, remaining, sr)
        sink, min_val, _, shortest, path, remaining, sr = \
            jax.lax.while_loop(cond, body, init)

        # --- dual updates (keep reduced costs ≥ 0) ------------------------
        # scanned rows i: u[i] += Δ − d[col4row[i]]  (cur_row: d = 0)
        d_of_row = jnp.where(jnp.arange(n) == cur_row, 0.0,
                             shortest[jnp.clip(col4row, 0, n - 1)])
        u = jnp.where(sr, u + min_val - d_of_row, u)
        # scanned cols j: v[j] −= Δ − d[j]
        v = jnp.where(~remaining, v - (min_val - shortest), v)

        # --- augment along the alternating path ---------------------------
        def aug_cond(s):
            return s[0] >= 0

        def aug_body(s):
            j, row4col, col4row = s
            i = path[j]
            row4col = row4col.at[j].set(i)
            j_next = col4row[i]
            col4row = col4row.at[i].set(j)
            return (j_next, row4col, col4row)

        _, row4col, col4row = jax.lax.while_loop(
            aug_cond, aug_body, (sink, row4col, col4row))
        return (u, v, row4col, col4row), None

    u0 = jnp.zeros((n,), jnp.float32)
    v0 = jnp.zeros((n,), jnp.float32)
    r0 = jnp.full((n,), -1, jnp.int32)
    c0 = jnp.full((n,), -1, jnp.int32)
    (_, _, _, col4row), _ = jax.lax.scan(
        assign_row, (u0, v0, r0, c0), jnp.arange(n, dtype=jnp.int32))
    return col4row


def min_cost_match(cost: jnp.ndarray, max_cost: float,
                   rows_valid: jnp.ndarray, cols_valid: jnp.ndarray
                   ) -> jnp.ndarray:
    """Deep-SORT `min_cost_matching` (utils.py:53-117) on fixed shapes.

    Clips the (R,C) cost matrix at max_cost + 1e-5 (exactly the
    reference's pre-solve clamp), pads to a square matrix, solves the
    exact LAP, then drops matches whose true cost exceeds max_cost or
    that hit an invalid row/column. Returns col_for_row (R,), −1 for
    unmatched.
    """
    R, C = cost.shape
    n = max(R, C)
    clipc = jnp.float32(max_cost + 1e-5)
    valid = (rows_valid[:, None] > 0) & (cols_valid[None, :] > 0)
    gated = jnp.where(valid, jnp.minimum(cost, clipc), clipc)
    sq = jnp.full((n, n), clipc)
    sq = sq.at[:R, :C].set(gated)
    col4row = solve_lap(sq)[:R]
    a = jnp.clip(col4row, 0, C - 1)
    ok = ((col4row < C) & (rows_valid > 0) & (cols_valid[a] > 0) &
          (cost[jnp.arange(R), a] <= max_cost))
    return jnp.where(ok, a, -1).astype(jnp.int32)
