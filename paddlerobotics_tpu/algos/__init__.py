"""Learning algorithms: SAC, BC, ES suite, replay — pure-functional JAX."""
