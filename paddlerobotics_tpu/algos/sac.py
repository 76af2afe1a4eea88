"""Soft Actor-Critic as pure-functional JAX (rebuild of alg/sac.py).

Exact recipe parity with the reference (alg/sac.py:24-118):
- tanh-squashed Gaussian policy, reparameterized sample, log-prob with
  the −log(1−tanh²+1e−6) bound correction (sac.py:65-75);
- twin-Q targets: min(Q1', Q2') − α·logπ, bootstrapped with the
  `terminal` mask convention of train.py:148-149;
- Polyak target sync with τ (sac.py:112-118);
- Adam on actor and critic with separate learning rates.

Everything is a pure function of (SACState, batch, rng) → (SACState,
losses); the whole learn step jits and fuses into the rollout when used
inside the training scan.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from paddlerobotics_tpu.algos.networks import (Actor, Critic,
                                               critic_apply_fused)
from paddlerobotics_tpu.core.config import SACConfig


class SACState(NamedTuple):
    actor_params: dict
    critic_params: dict
    target_critic_params: dict
    actor_opt: optax.OptState
    critic_opt: optax.OptState
    log_alpha: jnp.ndarray = None        # () when auto_alpha, else unused
    alpha_opt: optax.OptState = None


class SAC:
    """Holds static config + module defs; all methods pure."""

    def __init__(self, obs_dim: int, action_dim: int,
                 cfg: SACConfig = SACConfig(), actor=None):
        """`actor` overrides the default MLP policy (e.g. GRUActor for
        sensor_mode RNN='GRU'); it must map obs → (mean, log_std)."""
        self.cfg = cfg
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.actor = actor or Actor(action_dim, hidden=cfg.hidden_dim)
        self.critic = Critic(hidden=cfg.hidden_dim,
                             layer_norm=cfg.ln_critic)
        self.actor_tx = optax.adam(cfg.actor_lr)
        self.critic_tx = optax.adam(cfg.critic_lr)
        self.alpha_tx = optax.adam(cfg.alpha_lr)
        self.target_entropy = -float(action_dim)
        # Twin-Q forward used by learn(): fused stacked-matmul version
        # of self.critic (numerically identical on the same param tree;
        # networks.critic_apply_fused) — halves the learner's sequential
        # matmul chain. bf16 matmuls opt-in via cfg.bf16_matmul.
        self._q = functools.partial(critic_apply_fused,
                                    layer_norm=cfg.ln_critic,
                                    bf16=cfg.bf16_matmul)

    def init(self, rng: jax.Array) -> SACState:
        k1, k2 = jax.random.split(rng)
        obs = jnp.zeros((1, self.obs_dim))
        act = jnp.zeros((1, self.action_dim))
        actor_params = self.actor.init(k1, obs)
        critic_params = self.critic.init(k2, obs, act)
        log_alpha = jnp.asarray(jnp.log(self.cfg.alpha))
        return SACState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=jax.tree.map(lambda x: x, critic_params),
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            log_alpha=log_alpha,
            alpha_opt=self.alpha_tx.init(log_alpha))

    def reset_critic(self, state: SACState, rng: jax.Array) -> SACState:
        """Full critic re-initialization (primacy-bias reset): fresh twin-Q
        params, target copy, and optimizer state; the actor (and the
        replay buffer, held by the caller) are untouched. Mitigates the
        high-update-ratio plasticity loss of docs/update_schedule.md
        finding 3; gated by SACConfig.critic_reset_steps."""
        obs = jnp.zeros((1, self.obs_dim))
        act = jnp.zeros((1, self.action_dim))
        critic_params = self.critic.init(rng, obs, act)
        return state._replace(
            critic_params=critic_params,
            target_critic_params=jax.tree.map(lambda x: x, critic_params),
            critic_opt=self.critic_tx.init(critic_params))

    # -- inference ------------------------------------------------------------

    def predict(self, actor_params, obs: jnp.ndarray) -> jnp.ndarray:
        """Deterministic action = tanh(mean) (sac.py:60-63)."""
        mean, _ = self.actor.apply(actor_params, obs)
        return jnp.tanh(mean)

    def sample(self, actor_params, obs: jnp.ndarray, rng: jax.Array
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Reparameterized tanh-Gaussian sample + log prob (sac.py:65-75)."""
        mean, log_std = self.actor.apply(actor_params, obs)
        std = jnp.exp(log_std)
        noise = jax.random.normal(rng, mean.shape)
        x_t = mean + std * noise
        action = jnp.tanh(x_t)
        log_prob = (-0.5 * (noise ** 2) - log_std -
                    0.5 * jnp.log(2.0 * jnp.pi))
        log_prob = log_prob - jnp.log(1.0 - action ** 2 + 1e-6)
        return action, jnp.sum(log_prob, axis=-1, keepdims=True)

    # -- learning -------------------------------------------------------------

    def learn(self, state: SACState, batch, rng: jax.Array
              ) -> Tuple[SACState, dict]:
        """One (critic, actor, target-sync) update (sac.py:77-110).

        batch: dict with obs (B,o), act (B,a), rew (B,1), next_obs (B,o),
        terminal (B,1) — terminal already in the 1−done convention of
        train.py:148-149.
        """
        cfg = self.cfg
        k_next, k_pi = jax.random.split(rng)
        # log_alpha carries the live temperature when it's auto-tuned OR
        # host-annealed (SACConfig.alpha_anneal_steps; the trainer sets
        # it per chunk like the DR scale)
        alpha = (jnp.exp(state.log_alpha)
                 if (cfg.auto_alpha or cfg.alpha_anneal_steps > 0)
                 else cfg.alpha)

        # critic update
        next_act, next_logp = self.sample(state.actor_params,
                                          batch["next_obs"], k_next)
        q1_t, q2_t = self._q(state.target_critic_params,
                             batch["next_obs"], next_act)
        target_q = jnp.minimum(q1_t, q2_t) - alpha * next_logp
        target_q = batch["rew"] + cfg.gamma * batch["terminal"] * target_q
        target_q = jax.lax.stop_gradient(target_q)

        def critic_loss_fn(params):
            q1, q2 = self._q(params, batch["obs"], batch["act"])
            return (jnp.mean((q1 - target_q) ** 2) +
                    jnp.mean((q2 - target_q) ** 2))

        critic_loss, critic_grads = jax.value_and_grad(critic_loss_fn)(
            state.critic_params)
        c_updates, critic_opt = self.critic_tx.update(
            critic_grads, state.critic_opt)
        critic_params = optax.apply_updates(state.critic_params, c_updates)

        # actor update (against the updated critic, like the sequential
        # torch updates in sac.py:77-82)
        def actor_loss_fn(params):
            act, logp = self.sample(params, batch["obs"], k_pi)
            q1, q2 = self._q(critic_params, batch["obs"], act)
            min_q = jnp.minimum(q1, q2)
            return jnp.mean(alpha * logp - min_q)

        actor_loss, actor_grads = jax.value_and_grad(actor_loss_fn)(
            state.actor_params)
        a_updates, actor_opt = self.actor_tx.update(
            actor_grads, state.actor_opt)
        actor_params = optax.apply_updates(state.actor_params, a_updates)

        # temperature update (auto-alpha; SAC v2)
        log_alpha, alpha_opt = state.log_alpha, state.alpha_opt
        if cfg.auto_alpha:
            _, logp_now = self.sample(actor_params, batch["obs"], k_pi)
            logp_now = jax.lax.stop_gradient(logp_now)

            def alpha_loss_fn(la):
                return -jnp.mean(jnp.exp(la) *
                                 (logp_now + self.target_entropy))

            _, a_grad = jax.value_and_grad(alpha_loss_fn)(log_alpha)
            upd, alpha_opt = self.alpha_tx.update(a_grad, alpha_opt)
            log_alpha = optax.apply_updates(log_alpha, upd)

        # Polyak sync (sac.py:112-118)
        tau = cfg.tau
        target_params = jax.tree.map(
            lambda t, s: (1.0 - tau) * t + tau * s,
            state.target_critic_params, critic_params)

        new_state = SACState(
            actor_params=actor_params, critic_params=critic_params,
            target_critic_params=target_params,
            actor_opt=actor_opt, critic_opt=critic_opt,
            log_alpha=log_alpha, alpha_opt=alpha_opt)
        return new_state, {"critic_loss": critic_loss,
                           "actor_loss": actor_loss}
