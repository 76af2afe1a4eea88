"""Evolution-strategy solver suite as pure-functional JAX.

Rebuild of alg/es.py (estool lineage): SimpleGA, SimpleES, OpenES, PEPG
and CMA-ES with the same ask/tell/result semantics, but as (state, rng) →
(solutions, state) pure functions so an entire ES generation — ask,
population rollout, tell — jits into one program and the population axis
maps onto vmapped envs (replacing the reference's serial per-candidate
episodes, train.py:398-418, and the xparl RPC fan-out,
Dynamic_parallel_model.py:95-99).

Fitness shaping matches the reference: centered-rank transform
(es.py:20-27), L2 weight decay added to raw fitness (es.py:29-31).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def compute_centered_ranks(x: jnp.ndarray) -> jnp.ndarray:
    """(es.py:20-27) ranks in [-0.5, 0.5]."""
    n = x.shape[0]
    ranks = jnp.argsort(jnp.argsort(x))
    return ranks.astype(jnp.float32) / (n - 1) - 0.5


def compute_weight_decay(weight_decay: float, solutions: jnp.ndarray
                         ) -> jnp.ndarray:
    """(es.py:29-31) −λ·mean(θ²) per solution."""
    return -weight_decay * jnp.mean(solutions * solutions, axis=1)


# =============================== SimpleGA ====================================

class SimpleGAState(NamedTuple):
    """(es.py:214-326) elite + crossover GA with σ-anneal."""

    elite_params: jnp.ndarray   # (E, n)
    elite_rewards: jnp.ndarray  # (E,)
    sigma: jnp.ndarray          # ()
    best_param: jnp.ndarray     # (n,)
    curr_best_param: jnp.ndarray
    best_reward: jnp.ndarray    # ()
    curr_best_reward: jnp.ndarray
    first_iteration: jnp.ndarray  # () bool
    solutions: jnp.ndarray      # (P, n) last asked


class SimpleGA:
    def __init__(self, num_params: int, sigma_init=0.1, sigma_decay=0.999,
                 sigma_limit=0.01, popsize=256, elite_ratio=0.1,
                 forget_best=False, weight_decay=0.01):
        self.n = num_params
        self.popsize = popsize
        self.elite_popsize = max(1, int(popsize * elite_ratio))
        self.sigma_init = sigma_init
        self.sigma_decay = sigma_decay
        self.sigma_limit = sigma_limit
        self.forget_best = forget_best
        self.weight_decay = weight_decay

    def init(self, param: jnp.ndarray | None = None) -> SimpleGAState:
        p0 = jnp.zeros(self.n) if param is None else jnp.asarray(param)
        return SimpleGAState(
            elite_params=jnp.zeros((self.elite_popsize, self.n)),
            elite_rewards=jnp.zeros(self.elite_popsize),
            sigma=jnp.asarray(self.sigma_init),
            best_param=p0, curr_best_param=p0,
            best_reward=jnp.asarray(0.0), curr_best_reward=jnp.asarray(0.0),
            first_iteration=jnp.asarray(True),
            solutions=jnp.zeros((self.popsize, self.n)))

    def reset(self, state: SimpleGAState, param: jnp.ndarray) -> SimpleGAState:
        """(es.py:249-252) restart from a param, keep σ."""
        return state._replace(best_param=param, curr_best_param=param,
                              first_iteration=jnp.asarray(True))

    def ask(self, state: SimpleGAState, rng: jax.Array
            ) -> Tuple[jnp.ndarray, SimpleGAState]:
        """(es.py:257-281) elite crossover + Gaussian noise."""
        k_eps, k_a, k_b, k_mask = jax.random.split(rng, 4)
        eps = jax.random.normal(k_eps, (self.popsize, self.n)) * state.sigma
        idx_a = jax.random.randint(k_a, (self.popsize,), 0, self.elite_popsize)
        idx_b = jax.random.randint(k_b, (self.popsize,), 0, self.elite_popsize)
        mask = jax.random.uniform(k_mask, (self.popsize, self.n)) > 0.5
        child = jnp.where(mask, state.elite_params[idx_b],
                          state.elite_params[idx_a])
        first = state.first_iteration
        base = jnp.where(first, state.best_param[None, :], child)
        solutions = base + eps
        return solutions, state._replace(solutions=solutions)

    def tell(self, state: SimpleGAState, rewards: jnp.ndarray) -> SimpleGAState:
        """(es.py:283-314)."""
        reward_table = rewards
        if self.weight_decay > 0:
            reward_table = reward_table + compute_weight_decay(
                self.weight_decay, state.solutions)
        if self.forget_best:
            pool_r = reward_table
            pool_p = state.solutions
        else:
            # concat with elites; on the first iteration the zero-valued
            # elites are masked to −inf so they can't win.
            elite_r = jnp.where(state.first_iteration,
                                jnp.full_like(state.elite_rewards, -jnp.inf),
                                state.elite_rewards)
            pool_r = jnp.concatenate([reward_table, elite_r])
            pool_p = jnp.concatenate([state.solutions, state.elite_params])
        order = jnp.argsort(-pool_r)[: self.elite_popsize]
        elite_rewards = pool_r[order]
        elite_params = pool_p[order]
        curr_best_reward = elite_rewards[0]
        curr_best_param = elite_params[0]
        improved = state.first_iteration | (curr_best_reward > state.best_reward)
        best_reward = jnp.where(improved, curr_best_reward, state.best_reward)
        best_param = jnp.where(improved, curr_best_param, state.best_param)
        sigma = jnp.where(state.sigma > self.sigma_limit,
                          state.sigma * self.sigma_decay, state.sigma)
        return SimpleGAState(
            elite_params=elite_params, elite_rewards=elite_rewards,
            sigma=sigma, best_param=best_param,
            curr_best_param=curr_best_param, best_reward=best_reward,
            curr_best_reward=curr_best_reward,
            first_iteration=jnp.asarray(False), solutions=state.solutions)

    def result(self, state: SimpleGAState):
        """(best, best_reward, curr_best_reward, sigma, curr_best) —
        matching es.py:325-326."""
        return (state.best_param, state.best_reward, state.curr_best_reward,
                state.sigma, state.curr_best_param)


# =============================== SimpleES ====================================

class SimpleESState(NamedTuple):
    """(es.py:145-210) softmax-weighted mean ES."""

    mu: jnp.ndarray
    sigma: jnp.ndarray
    best_mu: jnp.ndarray
    best_reward: jnp.ndarray
    curr_best_mu: jnp.ndarray
    curr_best_reward: jnp.ndarray
    first_iteration: jnp.ndarray
    solutions: jnp.ndarray


class SimpleES:
    def __init__(self, num_params, popsize=256, sigma_init=0.1,
                 sigma_decay=0.999, sigma_limit=0.01, weight_decay=0.01):
        self.n = num_params
        self.popsize = popsize
        self.sigma_init = sigma_init
        self.sigma_decay = sigma_decay
        self.sigma_limit = sigma_limit
        self.weight_decay = weight_decay

    def init(self, param=None) -> SimpleESState:
        mu = jnp.zeros(self.n) if param is None else jnp.asarray(param)
        return SimpleESState(
            mu=mu, sigma=jnp.asarray(self.sigma_init), best_mu=mu,
            best_reward=jnp.asarray(0.0), curr_best_mu=mu,
            curr_best_reward=jnp.asarray(0.0),
            first_iteration=jnp.asarray(True),
            solutions=jnp.zeros((self.popsize, self.n)))

    def ask(self, state, rng):
        eps = jax.random.normal(rng, (self.popsize, self.n))
        solutions = state.mu[None, :] + eps * state.sigma
        return solutions, state._replace(solutions=solutions)

    def tell(self, state, rewards):
        reward = rewards + compute_weight_decay(self.weight_decay,
                                                state.solutions)
        best_i = jnp.argmax(reward)
        curr_best_reward = reward[best_i]
        curr_best_mu = state.solutions[best_i]
        improved = state.first_iteration | (curr_best_reward > state.best_reward)
        best_reward = jnp.where(improved, curr_best_reward, state.best_reward)
        best_mu = jnp.where(improved, curr_best_mu, state.best_mu)
        sigma = jnp.where(state.sigma > self.sigma_limit,
                          state.sigma * self.sigma_decay, state.sigma)
        # softmax weighting after [0,3] range normalization (es.py:198-207)
        lo, hi = jnp.min(reward), jnp.max(reward)
        scaled = jnp.where(hi - lo > 1e-2, 3.0 * (reward - lo) / (hi - lo),
                           reward)
        w = jax.nn.softmax(scaled)
        mu = jnp.sum(w[:, None] * state.solutions, axis=0)
        return SimpleESState(
            mu=mu, sigma=sigma, best_mu=best_mu, best_reward=best_reward,
            curr_best_mu=curr_best_mu, curr_best_reward=curr_best_reward,
            first_iteration=jnp.asarray(False), solutions=state.solutions)

    def result(self, state):
        return (state.best_mu, state.best_reward, state.curr_best_reward,
                state.sigma)


# ================================ OpenES =====================================

class OpenESState(NamedTuple):
    """(es.py:328-444) rank-centered NES with Adam."""

    mu: jnp.ndarray
    sigma: jnp.ndarray
    lr: jnp.ndarray
    adam_m: jnp.ndarray
    adam_v: jnp.ndarray
    adam_t: jnp.ndarray
    best_mu: jnp.ndarray
    best_reward: jnp.ndarray
    curr_best_mu: jnp.ndarray
    curr_best_reward: jnp.ndarray
    first_iteration: jnp.ndarray
    epsilon: jnp.ndarray
    solutions: jnp.ndarray


class OpenES:
    def __init__(self, num_params, sigma_init=0.1, sigma_decay=0.999,
                 sigma_limit=0.01, learning_rate=0.01,
                 learning_rate_decay=0.9999, learning_rate_limit=0.001,
                 popsize=256, antithetic=False, weight_decay=0.01,
                 rank_fitness=True, forget_best=True,
                 beta1=0.99, beta2=0.999):
        self.n = num_params
        self.popsize = popsize
        self.sigma_init = sigma_init
        self.sigma_decay = sigma_decay
        self.sigma_limit = sigma_limit
        self.lr_init = learning_rate
        self.lr_decay = learning_rate_decay
        self.lr_limit = learning_rate_limit
        self.antithetic = antithetic
        self.weight_decay = weight_decay
        self.rank_fitness = rank_fitness
        self.forget_best = True if rank_fitness else forget_best
        self.beta1, self.beta2 = beta1, beta2
        if antithetic:
            assert popsize % 2 == 0

    def init(self, param=None) -> OpenESState:
        mu = jnp.zeros(self.n) if param is None else jnp.asarray(param)
        z = jnp.zeros(self.n)
        return OpenESState(
            mu=mu, sigma=jnp.asarray(self.sigma_init),
            lr=jnp.asarray(self.lr_init), adam_m=z, adam_v=z,
            adam_t=jnp.asarray(0.0), best_mu=mu,
            best_reward=jnp.asarray(0.0), curr_best_mu=mu,
            curr_best_reward=jnp.asarray(0.0),
            first_iteration=jnp.asarray(True),
            epsilon=jnp.zeros((self.popsize, self.n)),
            solutions=jnp.zeros((self.popsize, self.n)))

    def ask(self, state, rng):
        if self.antithetic:
            half = jax.random.normal(rng, (self.popsize // 2, self.n))
            eps = jnp.concatenate([half, -half])
        else:
            eps = jax.random.normal(rng, (self.popsize, self.n))
        solutions = state.mu[None, :] + eps * state.sigma
        return solutions, state._replace(epsilon=eps, solutions=solutions)

    def tell(self, state, rewards):
        reward = rewards
        if self.rank_fitness:
            reward = compute_centered_ranks(reward)
        if self.weight_decay > 0:
            reward = reward + compute_weight_decay(self.weight_decay,
                                                   state.solutions)
        best_i = jnp.argmax(reward)
        curr_best_reward = reward[best_i]
        curr_best_mu = state.solutions[best_i]
        improved = state.first_iteration | jnp.asarray(self.forget_best) | \
            (curr_best_reward > state.best_reward)
        best_reward = jnp.where(improved, curr_best_reward, state.best_reward)
        best_mu = jnp.where(improved, curr_best_mu, state.best_mu)

        norm_r = (reward - jnp.mean(reward)) / (jnp.std(reward) + 1e-8)
        grad = -(1.0 / (self.popsize * state.sigma)) * (state.epsilon.T @ norm_r)
        # Adam (es.py:76-90) on gradient `grad` (note: reference applies
        # both a plain SGD step and an Adam step; the Adam step dominates —
        # we apply Adam only, the effective published behavior)
        t = state.adam_t + 1.0
        m = self.beta1 * state.adam_m + (1 - self.beta1) * grad
        v = self.beta2 * state.adam_v + (1 - self.beta2) * grad * grad
        a = state.lr * jnp.sqrt(1 - self.beta2 ** t) / (1 - self.beta1 ** t)
        mu = state.mu - a * m / (jnp.sqrt(v) + 1e-8)

        sigma = jnp.where(state.sigma > self.sigma_limit,
                          state.sigma * self.sigma_decay, state.sigma)
        lr = jnp.where(state.lr > self.lr_limit, state.lr * self.lr_decay,
                       state.lr)
        return state._replace(
            mu=mu, sigma=sigma, lr=lr, adam_m=m, adam_v=v, adam_t=t,
            best_mu=best_mu, best_reward=best_reward,
            curr_best_mu=curr_best_mu, curr_best_reward=curr_best_reward,
            first_iteration=jnp.asarray(False))

    def result(self, state):
        return (state.best_mu, state.best_reward, state.curr_best_reward,
                state.sigma)


# ================================= PEPG ======================================

class PEPGState(NamedTuple):
    """(es.py:446-619) antithetic PEPG with adaptive per-param σ."""

    mu: jnp.ndarray
    sigma: jnp.ndarray          # (n,)
    lr: jnp.ndarray
    adam_m: jnp.ndarray
    adam_v: jnp.ndarray
    adam_t: jnp.ndarray
    best_mu: jnp.ndarray
    best_reward: jnp.ndarray
    curr_best_mu: jnp.ndarray
    curr_best_reward: jnp.ndarray
    first_iteration: jnp.ndarray
    epsilon: jnp.ndarray        # (batch, n)
    solutions: jnp.ndarray


class PEPG:
    def __init__(self, num_params, sigma_init=0.1, sigma_alpha=0.2,
                 sigma_decay=0.999, sigma_limit=0.01, sigma_max_change=0.2,
                 learning_rate=0.01, learning_rate_decay=0.9999,
                 learning_rate_limit=0.01, elite_ratio=0, popsize=256,
                 average_baseline=True, weight_decay=0.01,
                 rank_fitness=True, forget_best=True,
                 beta1=0.99, beta2=0.999):
        self.n = num_params
        self.popsize = popsize
        self.average_baseline = average_baseline
        if average_baseline:
            assert popsize % 2 == 0
            self.batch_size = popsize // 2
        else:
            assert popsize % 2 == 1
            self.batch_size = (popsize - 1) // 2
        self.elite_popsize = int(popsize * elite_ratio)
        self.use_elite = self.elite_popsize > 0
        self.sigma_init = sigma_init
        self.sigma_alpha = sigma_alpha
        self.sigma_decay = sigma_decay
        self.sigma_limit = sigma_limit
        self.sigma_max_change = sigma_max_change
        self.lr_init = learning_rate
        self.lr_decay = learning_rate_decay
        self.lr_limit = learning_rate_limit
        self.weight_decay = weight_decay
        self.rank_fitness = rank_fitness
        self.forget_best = True if rank_fitness else forget_best
        self.beta1, self.beta2 = beta1, beta2

    def init(self, param=None) -> PEPGState:
        mu = jnp.zeros(self.n) if param is None else jnp.asarray(param)
        z = jnp.zeros(self.n)
        return PEPGState(
            mu=mu, sigma=jnp.ones(self.n) * self.sigma_init,
            lr=jnp.asarray(self.lr_init), adam_m=z, adam_v=z,
            adam_t=jnp.asarray(0.0), best_mu=mu,
            best_reward=jnp.asarray(0.0), curr_best_mu=mu,
            curr_best_reward=jnp.asarray(0.0),
            first_iteration=jnp.asarray(True),
            epsilon=jnp.zeros((self.batch_size, self.n)),
            solutions=jnp.zeros((self.popsize, self.n)))

    def ask(self, state, rng):
        eps = jax.random.normal(rng, (self.batch_size, self.n)) * \
            state.sigma[None, :]
        eps_full = jnp.concatenate([eps, -eps])
        if self.average_baseline:
            all_eps = eps_full
        else:
            all_eps = jnp.concatenate([jnp.zeros((1, self.n)), eps_full])
        solutions = state.mu[None, :] + all_eps
        return solutions, state._replace(epsilon=eps, solutions=solutions)

    def tell(self, state, rewards):
        reward_table = rewards
        if self.rank_fitness:
            reward_table = compute_centered_ranks(reward_table)
        if self.weight_decay > 0:
            reward_table = reward_table + compute_weight_decay(
                self.weight_decay, state.solutions)
        if self.average_baseline:
            b = jnp.mean(reward_table)
            reward = reward_table
        else:
            b = reward_table[0]
            reward = reward_table[1:]

        best_i = jnp.argmax(reward)
        best_reward_cand = reward[best_i]
        eps_full = jnp.concatenate([state.epsilon, -state.epsilon])
        take_cand = (best_reward_cand > b) | jnp.asarray(self.average_baseline)
        curr_best_mu = jnp.where(take_cand, state.mu + eps_full[best_i],
                                 state.mu)
        curr_best_reward = jnp.where(take_cand, best_reward_cand, b)
        improved = state.first_iteration | jnp.asarray(self.forget_best) | \
            (curr_best_reward > state.best_reward)
        best_reward = jnp.where(improved, curr_best_reward, state.best_reward)
        best_mu = jnp.where(improved, curr_best_mu, state.best_mu)

        # mean update
        if self.use_elite:
            order = jnp.argsort(-reward)[: self.elite_popsize]
            mu = state.mu + jnp.mean(eps_full[order], axis=0)
            m, v, t = state.adam_m, state.adam_v, state.adam_t
        else:
            rT = reward[: self.batch_size] - reward[self.batch_size:]
            change_mu = rT @ state.epsilon
            t = state.adam_t + 1.0
            grad = -change_mu
            m = self.beta1 * state.adam_m + (1 - self.beta1) * grad
            v = self.beta2 * state.adam_v + (1 - self.beta2) * grad * grad
            a = state.lr * jnp.sqrt(1 - self.beta2 ** t) / (1 - self.beta1 ** t)
            mu = state.mu - a * m / (jnp.sqrt(v) + 1e-8)

        # adaptive sigma (es.py:585-601)
        sigma = state.sigma
        if self.sigma_alpha > 0:
            stdev = 1.0 if self.rank_fitness else jnp.std(reward) + 1e-8
            S = (state.epsilon ** 2 - (sigma ** 2)[None, :]) / sigma[None, :]
            reward_avg = (reward[: self.batch_size] +
                          reward[self.batch_size:]) / 2.0
            rS = reward_avg - b
            delta_sigma = (rS @ S) / (2 * self.batch_size * stdev)
            change = jnp.clip(self.sigma_alpha * delta_sigma,
                              -self.sigma_max_change * sigma,
                              self.sigma_max_change * sigma)
            sigma = sigma + change
        if self.sigma_decay < 1:
            sigma = jnp.where(sigma > self.sigma_limit,
                              sigma * self.sigma_decay, sigma)
        lr = jnp.where((self.lr_decay < 1) & (state.lr > self.lr_limit),
                       state.lr * self.lr_decay, state.lr)
        return state._replace(
            mu=mu, sigma=sigma, lr=lr, adam_m=m, adam_v=v, adam_t=t,
            best_mu=best_mu, best_reward=best_reward,
            curr_best_mu=curr_best_mu, curr_best_reward=curr_best_reward,
            first_iteration=jnp.asarray(False))

    def result(self, state):
        return (state.best_mu, state.best_reward, state.curr_best_reward,
                state.sigma)


# ================================ CMA-ES =====================================

class CMAESState(NamedTuple):
    """Standard (μ/μ_w, λ)-CMA-ES state (the reference wraps pycma,
    es.py:92-143; this is a from-scratch JAX implementation)."""

    mean: jnp.ndarray       # (n,)
    sigma: jnp.ndarray      # ()
    C: jnp.ndarray          # (n,n) covariance
    p_sigma: jnp.ndarray    # (n,)
    p_c: jnp.ndarray        # (n,)
    gen: jnp.ndarray        # ()
    best_param: jnp.ndarray
    best_reward: jnp.ndarray
    solutions: jnp.ndarray
    z: jnp.ndarray          # (P,n) standard normals of last ask


class CMAES:
    def __init__(self, num_params, sigma_init=0.1, popsize=255,
                 weight_decay=0.01):
        self.n = num_params
        self.popsize = popsize
        self.sigma_init = sigma_init
        self.weight_decay = weight_decay
        n = num_params
        mu = popsize // 2
        w = jnp.log(mu + 0.5) - jnp.log(jnp.arange(1, mu + 1))
        self.weights = w / jnp.sum(w)
        self.mu_eff = 1.0 / jnp.sum(self.weights ** 2)
        self.c_sigma = (self.mu_eff + 2) / (n + self.mu_eff + 5)
        self.d_sigma = 1 + 2 * max(0.0, float(jnp.sqrt(
            (self.mu_eff - 1) / (n + 1))) - 1) + self.c_sigma
        self.c_c = (4 + self.mu_eff / n) / (n + 4 + 2 * self.mu_eff / n)
        self.c_1 = 2 / ((n + 1.3) ** 2 + self.mu_eff)
        self.c_mu = min(1 - self.c_1,
                        2 * (self.mu_eff - 2 + 1 / self.mu_eff) /
                        ((n + 2) ** 2 + self.mu_eff))
        self.chi_n = n ** 0.5 * (1 - 1 / (4 * n) + 1 / (21 * n ** 2))
        self.mu = mu

    def init(self, param=None) -> CMAESState:
        mean = jnp.zeros(self.n) if param is None else jnp.asarray(param)
        return CMAESState(
            mean=mean, sigma=jnp.asarray(self.sigma_init),
            C=jnp.eye(self.n), p_sigma=jnp.zeros(self.n),
            p_c=jnp.zeros(self.n), gen=jnp.asarray(0.0),
            best_param=mean, best_reward=jnp.asarray(-jnp.inf),
            solutions=jnp.zeros((self.popsize, self.n)),
            z=jnp.zeros((self.popsize, self.n)))

    def ask(self, state, rng):
        # C^(1/2) via symmetric eigendecomposition
        evals, evecs = jnp.linalg.eigh(state.C)
        evals = jnp.maximum(evals, 1e-12)
        A = evecs * jnp.sqrt(evals)[None, :]       # C^(1/2) (times evecsᵀ)
        z = jax.random.normal(rng, (self.popsize, self.n))
        y = z @ A.T
        solutions = state.mean[None, :] + state.sigma * y
        return solutions, state._replace(solutions=solutions, z=z)

    def tell(self, state, rewards):
        reward = rewards + compute_weight_decay(self.weight_decay,
                                                state.solutions)
        order = jnp.argsort(-reward)[: self.mu]
        y = (state.solutions - state.mean[None, :]) / state.sigma
        y_sel = y[order]
        y_w = jnp.sum(self.weights[:, None] * y_sel, axis=0)
        mean = state.mean + state.sigma * y_w

        evals, evecs = jnp.linalg.eigh(state.C)
        evals = jnp.maximum(evals, 1e-12)
        C_inv_sqrt = (evecs / jnp.sqrt(evals)[None, :]) @ evecs.T
        p_sigma = (1 - self.c_sigma) * state.p_sigma + jnp.sqrt(
            self.c_sigma * (2 - self.c_sigma) * self.mu_eff) * (C_inv_sqrt @ y_w)
        gen = state.gen + 1
        norm_ps = jnp.linalg.norm(p_sigma)
        sigma = state.sigma * jnp.exp(
            (self.c_sigma / self.d_sigma) * (norm_ps / self.chi_n - 1))
        h_sigma = (norm_ps / jnp.sqrt(1 - (1 - self.c_sigma) ** (2 * gen))
                   < (1.4 + 2 / (self.n + 1)) * self.chi_n).astype(jnp.float32)
        p_c = (1 - self.c_c) * state.p_c + h_sigma * jnp.sqrt(
            self.c_c * (2 - self.c_c) * self.mu_eff) * y_w
        rank_mu = jnp.einsum("i,ij,ik->jk", self.weights, y_sel, y_sel)
        delta_h = (1 - h_sigma) * self.c_c * (2 - self.c_c)
        C = ((1 - self.c_1 - self.c_mu) * state.C +
             self.c_1 * (jnp.outer(p_c, p_c) + delta_h * state.C) +
             self.c_mu * rank_mu)

        best_i = jnp.argmax(reward)
        improved = reward[best_i] > state.best_reward
        best_param = jnp.where(improved, state.solutions[best_i],
                               state.best_param)
        best_reward = jnp.where(improved, reward[best_i], state.best_reward)
        return CMAESState(
            mean=mean, sigma=sigma, C=C, p_sigma=p_sigma, p_c=p_c, gen=gen,
            best_param=best_param, best_reward=best_reward,
            solutions=state.solutions, z=state.z)

    def result(self, state):
        return (state.best_param, state.best_reward, state.best_reward,
                state.sigma)


SOLVERS = {
    "simple_ga": SimpleGA,
    "simple_es": SimpleES,
    "open_es": OpenES,
    "pepg": PEPG,
    "cma_es": CMAES,
}
