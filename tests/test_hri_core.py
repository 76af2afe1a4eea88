import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerobotics_tpu.hri import tracker, utils
from paddlerobotics_tpu.hri.attention_ctrl import (AttentionController,
                                                   AttnCtrlConfig,
                                                   controller_loss,
                                                   top_k_sampling)
from paddlerobotics_tpu.hri.transformer import frame_ids_to_attn_mask


@pytest.fixture(scope="module")
def cfg():
    return AttnCtrlConfig(num_actions=17, num_frames=3, tokens_per_frame=4,
                          model_dim=32, num_decoder_blocks=2, num_heads=4,
                          ffn_dim=64, act_tr_dim=24)


def test_frame_mask_matches_reference_semantics():
    """Mask for ids [1,1,2,2] must be the reference's block mask
    (attention_ctrl.py:219-239 example)."""
    ids = jnp.asarray([[1, 1, 2, 2]])
    m = np.asarray(frame_ids_to_attn_mask(ids))[0]
    expect = np.array([[1, 1, 0, 0], [1, 1, 0, 0],
                       [1, 1, 1, 1], [1, 1, 1, 1]], np.float32)
    np.testing.assert_array_equal(m, expect)


def _dummy_inputs(cfg, B=2):
    T = cfg.num_frames * cfg.tokens_per_frame
    rng = np.random.RandomState(0)
    tokens = {"visual_tokens": jnp.asarray(
        rng.randn(B, T, cfg.visual_token_dim), jnp.float32)}
    frame_ids = jnp.asarray(
        np.repeat(np.arange(1, cfg.num_frames + 1), cfg.tokens_per_frame)
    )[None].repeat(B, 0)
    padding = jnp.ones((B, T))
    return tokens, frame_ids, padding


def test_controller_forward_shapes(cfg):
    model = AttentionController(cfg)
    tokens, fids, pad = _dummy_inputs(cfg)
    params = model.init(jax.random.key(0), tokens, fids, pad)
    out = model.apply(params, tokens, fids, pad)
    B = 2
    T = cfg.num_frames * cfg.tokens_per_frame
    assert out["trigger_logits"].shape == (B, cfg.num_frames)
    assert out["obj_logits"].shape == (B, T)
    assert out["act_logits"].shape == (B, cfg.num_frames, cfg.num_actions)
    assert out["present_kv_arr"].shape == (
        B, cfg.num_decoder_blocks, 2, cfg.num_heads, T,
        cfg.model_dim // cfg.num_heads)


def test_controller_loss_decreases(cfg):
    import optax

    model = AttentionController(cfg)
    tokens, fids, pad = _dummy_inputs(cfg)
    params = model.init(jax.random.key(0), tokens, fids, pad)
    B = 2
    has_act = jnp.asarray([[1.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
    is_obj = jnp.ones((B, cfg.num_frames * cfg.tokens_per_frame)) * 0.5
    act_ids = jnp.asarray([[3, 0, 5], [0, 7, 0]])

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = model.apply(p, tokens, fids, pad)
            total, aux = controller_loss(cfg, out, has_act, is_obj,
                                         act_ids, pad)
            return total, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    losses = []
    for _ in range(20):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_incremental_inference_matches_full(cfg):
    """Past-KV single-frame decoding must equal full-sequence decoding."""
    model = AttentionController(cfg)
    tokens, fids, pad = _dummy_inputs(cfg, B=1)
    params = model.init(jax.random.key(0), tokens, fids, pad)
    out_full = model.apply(params, tokens, fids, pad)

    # incremental: frame by frame
    tpf = cfg.tokens_per_frame
    past_kv = None
    past_pad = None
    for f in range(cfg.num_frames):
        sl = slice(f * tpf, (f + 1) * tpf)
        toks = {"visual_tokens": tokens["visual_tokens"][:, sl]}
        out = model.apply(params, toks, fids[:, sl], pad[:, sl],
                          past_kv_arr=past_kv, past_padding_mask=past_pad)
        # build growing cache
        if past_kv is None:
            past_kv = out["present_kv_arr"]
            past_pad = pad[:, sl]
        else:
            past_kv = jnp.concatenate([past_kv, out["present_kv_arr"]],
                                      axis=-2)
            past_pad = jnp.concatenate([past_pad, pad[:, sl]], axis=-1)
    # last frame's trigger/action must match the full pass
    np.testing.assert_allclose(
        np.asarray(out["trigger_logits"][0, -1]),
        np.asarray(out_full["trigger_logits"][0, -1]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["act_logits"][0, -1]),
        np.asarray(out_full["act_logits"][0, -1]), atol=1e-3)


def test_top_k_sampling_excludes_null(cfg):
    logits = jnp.asarray(np.random.RandomState(0).randn(4, 3, 17),
                         jnp.float32)
    ids = top_k_sampling(jax.random.key(0), logits, 1.0, 5)
    assert ids.shape == (4, 3)
    assert not np.any(np.asarray(ids) == 0)


def test_bbox_pos_emb():
    emb = utils.get_bbox_pos_emb(jnp.asarray([100.0, 50.0, 300.0, 250.0]),
                                 480, 640)
    assert emb.shape == (2, 5, 5)
    assert float(jnp.abs(emb).max()) <= 1.0
    # full-image bbox spans the sin range
    emb_full = utils.get_bbox_pos_emb(jnp.asarray([0.0, 0.0, 640.0, 480.0]),
                                      480, 640)
    np.testing.assert_allclose(float(emb_full[0, 0, 0]), -1.0, atol=1e-5)
    np.testing.assert_allclose(float(emb_full[0, 0, -1]), 1.0, atol=1e-5)


def test_tracker_lifecycle():
    """Consistent detections → a confirmed, stable track id."""
    state = tracker.init_tracker()
    feat = jnp.ones((4, tracker.FEATURE_DIM)) / np.sqrt(tracker.FEATURE_DIM)
    step = jax.jit(lambda s, b: tracker.tracker_update(
        tracker.tracker_predict(s), b, feat,
        jnp.asarray([True, False, False, False])))
    tids = []
    for i in range(6):
        boxes = jnp.asarray([[100 + 2 * i, 100, 150 + 2 * i, 220]] * 4,
                            jnp.float32)
        state, tid = step(state, boxes)
        tids.append(int(tid[0]))
    # confirmed after n_init hits, id stable
    assert int(jnp.sum(state.status == tracker.CONFIRMED)) == 1
    assert tids[-1] == tids[-2] == 1


def test_tracker_two_objects_distinct_ids():
    state = tracker.init_tracker()
    rng = np.random.RandomState(0)
    f1 = rng.rand(tracker.FEATURE_DIM)
    f2 = rng.rand(tracker.FEATURE_DIM)
    feats = jnp.asarray(np.stack([f1, f2]), jnp.float32)
    valid = jnp.asarray([True, True])
    for i in range(5):
        boxes = jnp.asarray([[50, 50, 100, 150],
                             [400, 200, 460, 350]], jnp.float32)
        state = tracker.tracker_predict(state)
        state, tid = tracker.tracker_update(state, boxes, feats, valid)
    assert int(jnp.sum(state.status == tracker.CONFIRMED)) == 2
    assert int(tid[0]) != int(tid[1])


def test_controller_instance_variant():
    """The 'instance' ablation inputs (inst_fm + cls + pos) must build
    and produce the same head shapes (attention_ctrl.py:91, 303-356)."""
    cfg = AttnCtrlConfig(inputs_type="instance", num_actions=9,
                         num_frames=2, tokens_per_frame=3, model_dim=16,
                         num_decoder_blocks=1, num_heads=2, ffn_dim=32,
                         act_tr_dim=12, inst_fm_reduce_dim=8,
                         inst_fm_flatten_dim=16)
    model = AttentionController(cfg)
    B, T = 2, 6
    tokens = {
        "inst_fm": jnp.zeros((B, T, 4, 5, 5)),
        "inst_cls": jnp.zeros((B, T, cfg.inst_cls_dim)),
        "inst_pos_emb": jnp.zeros((B, T, cfg.inst_pos_dim)),
    }
    fids = jnp.tile(jnp.asarray([1, 1, 1, 2, 2, 2]), (B, 1))
    pad = jnp.ones((B, T))
    params = model.init(jax.random.key(0), tokens, fids, pad)
    out = model.apply(params, tokens, fids, pad)
    assert out["trigger_logits"].shape == (B, 2)
    assert out["act_logits"].shape == (B, 2, 9)


def test_controller_without_fm_variant():
    """without_inst_fm ablation: cls + pos only."""
    cfg = AttnCtrlConfig(inputs_type="without_inst_fm", num_actions=9,
                         num_frames=2, tokens_per_frame=3, model_dim=16,
                         num_decoder_blocks=1, num_heads=2, ffn_dim=32,
                         act_tr_dim=12)
    model = AttentionController(cfg)
    B, T = 2, 6
    tokens = {
        "inst_cls": jnp.zeros((B, T, cfg.inst_cls_dim)),
        "inst_pos_emb": jnp.zeros((B, T, cfg.inst_pos_dim)),
    }
    fids = jnp.tile(jnp.asarray([1, 1, 1, 2, 2, 2]), (B, 1))
    pad = jnp.ones((B, T))
    params = model.init(jax.random.key(1), tokens, fids, pad)
    out = model.apply(params, tokens, fids, pad)
    assert out["obj_logits"].shape == (B, T)
