"""Batched quadruped gym-style environments (pure-functional reset/step)."""

from paddlerobotics_tpu.envs.registry import make_env  # noqa: F401
