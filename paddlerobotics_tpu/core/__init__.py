"""Core math, types and configuration for paddlerobotics_tpu."""
