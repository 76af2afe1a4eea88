"""Training entry points: ETG-RL dual loop, ETG pretrain, BC distill,
dynamics identification — TPU-native rebuilds of the reference's
train.py / pretrain.py / BCtrain.py / Dynamic_train.py."""
