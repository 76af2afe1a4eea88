"""Command-line entry points mirroring the reference's scripts
(train.py, pretrain.py, BCtrain.py, Dynamic_train.py, env_test.py,
deployment/test.py)."""
