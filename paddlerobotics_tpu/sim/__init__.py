"""TPU-native A1 quadruped simulation: kinematics, Featherstone dynamics,
soft contact, terrain, and motor models — all batched, jit-compatible JAX."""
