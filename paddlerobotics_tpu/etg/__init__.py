"""Evolutionary Trajectory Generator: RBF-phase oscillator + linear readout
fit by least squares, the JAX rebuild of rlschool's ETG_layer/ETG_model
(driven from ETGRL/train.py:296-301)."""
