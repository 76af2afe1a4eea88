"""Multi-chip scaling via jax.sharding: env-axis data parallelism +
model-axis tensor parallelism over a device Mesh."""
