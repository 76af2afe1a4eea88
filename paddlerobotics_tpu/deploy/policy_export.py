"""Policy + gait export for deployment.

Rebuilds the reference's deployment handoff:
- env_test.py:30-60 rolls a fixed ETG 600 steps and saves
  `gait_action_list_*.npy` (600,12) for on-robot replay → `export_gait_table`.
- deployment/test.py:48-105 loads the SAC .pt + gait npy and runs
  `predict(obs)*act_bound + ETG[i]` at fixed rate → `export_policy_fn`
  returns a single jitted (obs, i) → joint-target function with the gait
  table baked in as a constant, plus an AOT-compiled version.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from paddlerobotics_tpu.algos.sac import SAC, SACState
from paddlerobotics_tpu.core.config import QuadrupedConfig
from paddlerobotics_tpu.etg import model as etg_model
from paddlerobotics_tpu.sim import a1_model as a1


def export_gait_table(cfg: QuadrupedConfig, etg_w, etg_b,
                      n_steps: int = 600, path: str | None = None
                      ) -> np.ndarray:
    """(n_steps, 12) joint-space ETG_act table (env_test.py equivalent).

    Resolves pairing='auto' against the task mode exactly like the envs
    do, so a gallop-trained policy exports the bound-gait table rather
    than silently replaying trot.
    """
    etg_cfg = etg_model.resolve_pairing(cfg.etg, cfg.task.task_mode)
    table = np.asarray(etg_model.gait_table(jnp.asarray(etg_w),
                                            jnp.asarray(etg_b),
                                            etg_cfg, n_steps))
    if path:
        np.save(path, table)
    return table


def export_policy_fn(sac: SAC, sac_state: SACState,
                     gait_table: np.ndarray,
                     act_bound: np.ndarray
                     ) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Jitted real-time control function.

    policy(obs, i) → 12 joint targets = default_pose + gait[i] +
    predict(obs)·act_bound  (deployment/test.py:95-99).
    """
    table = jnp.asarray(gait_table)
    bound = jnp.asarray(act_bound)
    base = jnp.asarray(a1.INIT_MOTOR_ANGLES)
    params = sac_state.actor_params

    @jax.jit
    def policy(obs: jnp.ndarray, i: jnp.ndarray) -> jnp.ndarray:
        act = sac.predict(params, obs[None, :])[0]
        return base + table[i % table.shape[0]] + act * bound

    return policy


def aot_compile_policy(policy, obs_dim: int):
    """Ahead-of-time compile for latency-critical serving (no first-call
    compile hitch in the 100 Hz loop, deployment/test.py:93)."""
    lowered = jax.jit(policy).lower(jnp.zeros(obs_dim),
                                    jnp.zeros((), jnp.int32))
    return lowered.compile()
