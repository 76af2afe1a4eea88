"""Behavior cloning (expert → student distillation), rebuild of alg/BC.py.

BClearn (BC.py:53-72): actor loss = −log N(expert_action | student
Gaussian); critic loss = MSE distillation of the expert's twin-Q values
at the student's sampled action.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from paddlerobotics_tpu.algos.networks import Actor, Critic
from paddlerobotics_tpu.algos.sac import SAC, SACState


class BCState(NamedTuple):
    actor_params: dict
    critic_params: dict
    actor_opt: optax.OptState
    critic_opt: optax.OptState


class BC:
    def __init__(self, obs_dim: int, action_dim: int,
                 actor_lr: float = 3e-4, critic_lr: float = 3e-4,
                 hidden: int = 256):
        self.obs_dim = obs_dim
        self.action_dim = action_dim
        self.actor = Actor(action_dim, hidden=hidden)
        self.critic = Critic(hidden=hidden)
        self.actor_tx = optax.adam(actor_lr)
        self.critic_tx = optax.adam(critic_lr)

    def init(self, rng: jax.Array) -> BCState:
        k1, k2 = jax.random.split(rng)
        obs = jnp.zeros((1, self.obs_dim))
        act = jnp.zeros((1, self.action_dim))
        actor_params = self.actor.init(k1, obs)
        critic_params = self.critic.init(k2, obs, act)
        return BCState(actor_params, critic_params,
                       self.actor_tx.init(actor_params),
                       self.critic_tx.init(critic_params))

    def predict(self, actor_params, obs):
        mean, _ = self.actor.apply(actor_params, obs)
        return jnp.tanh(mean)

    def learn(self, state: BCState, batch, expert: SAC,
              expert_state: SACState, rng: jax.Array
              ) -> Tuple[BCState, dict]:
        """batch: {obs (student view), ref_obs (expert view)}."""
        k1, k2 = jax.random.split(rng)
        ref_action = expert.predict(expert_state.actor_params,
                                    batch["ref_obs"])
        ref_action = jax.lax.stop_gradient(ref_action)

        def actor_loss_fn(params):
            mean, log_std = self.actor.apply(params, batch["obs"])
            # −log N(ref_action | mean, std)  (BC.py:58 uses the *pre-tanh*
            # normal; the expert's tanh-squashed action is treated as the
            # sample, matching the reference's direct log_prob call)
            var = jnp.exp(2.0 * log_std)
            nll = 0.5 * ((ref_action - mean) ** 2 / var) + log_std + \
                0.5 * jnp.log(2.0 * jnp.pi)
            return jnp.mean(jnp.sum(nll, axis=-1))

        actor_loss, a_grads = jax.value_and_grad(actor_loss_fn)(
            state.actor_params)
        a_up, actor_opt = self.actor_tx.update(a_grads, state.actor_opt)
        actor_params = optax.apply_updates(state.actor_params, a_up)

        # critic distillation at the student's current sampled action
        mean, log_std = self.actor.apply(actor_params, batch["obs"])
        noise = jax.random.normal(k2, mean.shape)
        action_now = jnp.tanh(mean + jnp.exp(log_std) * noise)
        action_now = jax.lax.stop_gradient(action_now)
        rq1, rq2 = expert.critic.apply(expert_state.critic_params,
                                       batch["ref_obs"], action_now)
        rq1, rq2 = jax.lax.stop_gradient(rq1), jax.lax.stop_gradient(rq2)

        def critic_loss_fn(params):
            q1, q2 = self.critic.apply(params, batch["obs"], action_now)
            return jnp.mean((q1 - rq1) ** 2) + jnp.mean((q2 - rq2) ** 2)

        critic_loss, c_grads = jax.value_and_grad(critic_loss_fn)(
            state.critic_params)
        c_up, critic_opt = self.critic_tx.update(c_grads, state.critic_opt)
        critic_params = optax.apply_updates(state.critic_params, c_up)

        return BCState(actor_params, critic_params, actor_opt, critic_opt), {
            "actor_loss": actor_loss, "critic_loss": critic_loss}
