"""Multimodal action space: id maps, discrete controllers, and action
embedding assembly.

Rebuild of HRI/TFVT_HRI/interaction/action.py:30-65, expression.py:46-80,
movement.py:16-37 (id maps kept verbatim — they are the serving
contract) and scripts/collect_act_emb.py:42-54: a multimodal action is
(action, expression, utterance[, movement]) and its embedding is
concat(one-hot act, one-hot exp, ERNIE(utterance)) → the `wae` table the
attention controller dots frame hiddens against (num_actions=317 in
serving, server/attn_program.py:20).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

ACTION_TO_ID = {
    "null": 0, "shake_hand": 1, "raise_hand": 2, "raise_left_hand": 3,
    "hug": 4, "give_me_five": 5, "twist_head": 6, "turn_head_to_left": 7,
    "turn_head_to_right": 8, "wave": 9, "altman": 10, "superman": 11,
}
ACTION_TO_ID_V2 = {
    "null": 0, "shake_hand": 1, "hug": 2, "wave": 3, "altman": 4,
    "superman": 5,
}
EXPRESSION_TO_ID = {
    "null": 0, "smile": 1, "embarrassed": 2, "shy": 3, "anthomaniac": 4,
    "nervous": 5, "shocked": 6, "cry": 7, "sleepy": 8, "blushed": 9,
    "depressed": 10, "thinking": 11, "blink": 12, "concentrated": 13,
    "collapse": 14, "despise": 15, "angry": 16, "watch": 17, "cool": 18,
    "desperate": 19, "snigger": 20, "sharp": 21, "think_of": 22,
    "proud": 23, "panic": 24, "sweat": 25, "fighting": 26, "confused": 27,
    "dizzy": 28, "bah": 29,
}
EXPRESSION_TO_ID_V2 = {"null": 0, "shuangzhayan": 1, "xinxin": 2, "shy": 3}
MOVEMENT_TO_ID = {
    "null": 0, "move_ahead": 1, "move_backward": 2, "move_left": 3,
    "move_right": 4, "turn_left": 5, "turn_right": 6,
}


def _invert(d):
    return {v: k for k, v in d.items()}


def action_to_id(a, version="v1"):
    return (ACTION_TO_ID if version == "v1" else ACTION_TO_ID_V2)[a]


def id_to_action(i, version="v1"):
    return _invert(ACTION_TO_ID if version == "v1" else ACTION_TO_ID_V2)[i]


def expression_to_id(e, version="v1"):
    return (EXPRESSION_TO_ID if version == "v1" else EXPRESSION_TO_ID_V2)[e]


def id_to_expression(i, version="v1"):
    return _invert(EXPRESSION_TO_ID if version == "v1"
                   else EXPRESSION_TO_ID_V2)[i]


def movement_to_id(m):
    return MOVEMENT_TO_ID[m]


def id_to_movement(i):
    return _invert(MOVEMENT_TO_ID)[i]


def action_set_size(version="v1"):
    return len(ACTION_TO_ID if version == "v1" else ACTION_TO_ID_V2)


def expression_set_size(version="v1"):
    return len(EXPRESSION_TO_ID if version == "v1" else EXPRESSION_TO_ID_V2)


def movement_set_size():
    return len(MOVEMENT_TO_ID)


@dataclasses.dataclass
class MultimodalAction:
    """One row of the action catalog (jetson/multimodal_act.hpp)."""

    act: str = "null"
    exp: str = "null"
    utterance: str = ""
    movement: str = "null"

    def one_hot(self, version="v1") -> np.ndarray:
        a = np.zeros(action_set_size(version))
        e = np.zeros(expression_set_size(version))
        a[action_to_id(self.act, version)] = 1.0
        e[expression_to_id(self.exp, version)] = 1.0
        return np.concatenate([a, e])


def build_action_embeddings(actions: List[MultimodalAction],
                            utterance_embs: np.ndarray,
                            version: str = "v1") -> np.ndarray:
    """(A, act_n + exp_n + 768) embedding table = the reference's
    raw_wae.npy (collect_act_emb.py:42-54)."""
    rows = [np.concatenate([a.one_hot(version), u])
            for a, u in zip(actions, utterance_embs)]
    return np.asarray(rows, np.float32)


class DiscreteController(nn.Module):
    """fc stack → softmax over a discrete id space
    (interaction/common/discrete_ctrl.py semantics)."""

    num_outputs: int
    hidden_dims: tuple = (256,)

    @nn.compact
    def __call__(self, feat):
        h = feat
        for d in self.hidden_dims:
            h = nn.relu(nn.Dense(d)(h))
        return nn.Dense(self.num_outputs)(h)


class SalutationClsTree(nn.Module):
    """Salutation head over an instance feature map: 6 classes arranged
    as a (gender → age) tree (interaction/salutation_cls.py:4-60):
    [man, young_boy, uncle, woman, young_girl, aunt]."""

    hidden_dims: tuple = (512, 256)

    @nn.compact
    def __call__(self, fm):
        # fm (...,5,5,C): 1×1 conv reduce → MLP → 6 logits
        h = nn.relu(nn.Conv(128, (1, 1))(fm))
        h = h.reshape(h.shape[:-3] + (-1,))
        for d in self.hidden_dims:
            h = nn.relu(nn.Dense(d)(h))
        return nn.Dense(6)(h)


SALUTATIONS = ("man", "young_boy", "uncle", "woman", "young_girl", "aunt")
