"""Proactive human-robot interaction stack (rebuild of HRI/TFVT_HRI):
perception (YOLO detect + RoIAlign tokens + Deep-SORT tracking + text
encoder), transformer attention controller, multimodal action space,
training and serving — JAX/flax, TPU-first."""
