"""TPU-oriented compute helpers: unrolled small-matrix algebra and Pallas
kernels for the simulator hot path."""
