"""paddlerobotics_tpu — a TPU-native robotics-learning framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
PaddlePaddle/PaddleRobotics (quadruped ETG-RL locomotion stack + proactive
HRI stack), designed TPU-first:

- The PyBullet A1 environment (reference: QuadrupedalRobots/ETGRL, with the
  robot-sim layer mirrored at deployment/robots/minitaur.py) becomes a
  batched, jit-compatible articulated-body simulator (Featherstone ABA +
  soft-contact) that runs thousands of envs per chip via ``jax.vmap`` and
  scales over ICI with ``jax.sharding``/``shard_map``.
- The ETG trajectory generator, its ES outer loop, and the SAC residual
  policy (reference: train.py, alg/es.py, alg/sac.py) are pure-functional
  JAX so rollout + learning fuse into single compiled programs.
- The HRI perception/decision stack (reference: HRI/TFVT_HRI) is rebuilt
  with flax transformers and vmapped trackers under ``paddlerobotics_tpu.hri``.
"""

__version__ = "0.1.0"

from paddlerobotics_tpu.core import math3d  # noqa: F401
