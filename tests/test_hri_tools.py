"""HRI tooling: serving-bundle export (save_infer_model_params.py
equivalent), darknet-built SceneSensor, dataset preparation CLI
(prepare_dataset.py), tracking preprocessor (collect_v2_data.py), and
attention-training resume (--init_params + tb_state counter)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlerobotics_tpu.hri import export as export_mod
from paddlerobotics_tpu.hri.attention_ctrl import (AttentionController,
                                                   AttnCtrlConfig)
from paddlerobotics_tpu.hri.perception import darknet
from paddlerobotics_tpu.hri.perception.scene import DarknetSceneSensor

from test_darknet_import import TINY_CFG

TINY_CTRL = dict(num_actions=5, num_frames=2, tokens_per_frame=3,
                 model_dim=16, num_decoder_blocks=1, num_heads=2,
                 ffn_dim=32)


def _tiny_ctrl_params(cfg):
    model = AttentionController(cfg)
    T = cfg.num_frames * cfg.tokens_per_frame
    return model.init(
        jax.random.key(0),
        {"visual_tokens": jnp.zeros((1, T, cfg.visual_token_dim))},
        jnp.ones((1, T), jnp.int32), jnp.ones((1, T)))


def test_bundle_roundtrip(tmp_path):
    cfg = AttnCtrlConfig(**TINY_CTRL)
    params = _tiny_ctrl_params(cfg)
    wae = np.random.RandomState(0).randn(5, 7).astype(np.float32)
    export_mod.save_bundle(str(tmp_path / "b"), cfg, params, wae=wae,
                           extra={"trigger_threshold": 0.7})
    template = jax.tree.map(jnp.zeros_like, params)
    manifest, cfg2, params2, scene2, wae2 = export_mod.load_bundle(
        str(tmp_path / "b"), template)
    assert cfg2 == cfg
    assert scene2 is None
    np.testing.assert_allclose(wae2, wae)
    assert manifest["extra"]["trigger_threshold"] == 0.7
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(a, b)


def test_darknet_scene_sensor():
    sections = darknet.parse_cfg(TINY_CFG)
    scene = DarknetSceneSensor(sections)
    assert scene.input_size == 32            # from [net] width
    params = scene.init(jax.random.key(0))
    img = jnp.linspace(0, 1, 32 * 32 * 3).reshape(1, 32, 32, 3)
    inst = jax.jit(lambda p, x: scene.get_instances_with_feats(
        p, x, score_threshold=0.0))(params, img)
    K = inst.boxes.shape[1]
    assert inst.boxes.shape == (1, K, 4)
    assert inst.tokens.shape[0] == 1 and inst.tokens.ndim == 3
    assert bool(jnp.any(inst.valid))         # threshold 0 keeps top-K
    assert np.isfinite(np.asarray(inst.tokens)).all()


def test_export_cli_and_bundle_load(tmp_path):
    """cli/train_attention → checkpoint → cli/export_hri_model → bundle."""
    from paddlerobotics_tpu.cli import export_hri_model, train_attention

    out = tmp_path / "attn"
    train_attention.main([
        "--synthetic", "2", "--epochs", "1", "--batch_size", "2",
        "--num_actions", "5", "--num_frames", "2", "--tokens_per_frame",
        "3", "--model_dim", "16", "--num_decoder_blocks", "1",
        "--num_heads", "2", "--ffn_dim", "32", "--outdir", str(out)])
    ckpts = [d for d in os.listdir(out) if d.startswith("itr_")]
    assert ckpts
    bundle = tmp_path / "bundle"
    export_hri_model.main([
        "--ckpt", str(out / sorted(ckpts)[-1]), "--out", str(bundle),
        "--num_actions", "5", "--num_frames", "2", "--tokens_per_frame",
        "3", "--model_dim", "16", "--num_decoder_blocks", "1",
        "--num_heads", "2", "--ffn_dim", "32"])
    cfg = AttnCtrlConfig(**TINY_CTRL)
    template = _tiny_ctrl_params(cfg)
    manifest, cfg2, params, _, _ = export_mod.load_bundle(
        str(bundle), template)
    assert cfg2.num_actions == 5
    assert all(np.isfinite(l).all() for l in jax.tree.leaves(params))


def test_train_attention_resume(tmp_path):
    """--init_params resumes params/opt/step (tb_state semantics)."""
    from paddlerobotics_tpu.cli import train_attention

    out = tmp_path / "a"
    args = ["--synthetic", "3", "--epochs", "1", "--batch_size", "2",
            "--num_actions", "5", "--num_frames", "2",
            "--tokens_per_frame", "3", "--model_dim", "16",
            "--num_decoder_blocks", "1", "--num_heads", "2",
            "--ffn_dim", "32", "--outdir", str(out)]
    train_attention.main(args)
    ck = sorted(d for d in os.listdir(out) if d.startswith("itr_"))[-1]
    out2 = tmp_path / "b"
    train_attention.main(args[:-1] + [str(out2), "--init_params",
                                      str(out / ck)])
    ck2 = sorted((int(d[4:]) for d in os.listdir(out2)
                  if d.startswith("itr_")))
    assert ck2[-1] == 2 * int(ck[4:])        # step counter continued


def test_train_attention_cli_instance_variant(tmp_path):
    """--inputs_type instance with --synthetic must train (the synthetic
    batch is variant-shaped via hri.train_attention.synthetic_batch)."""
    from paddlerobotics_tpu.cli import train_attention

    out = tmp_path / "inst"
    train_attention.main([
        "--inputs_type", "instance", "--synthetic", "1", "--epochs", "1",
        "--batch_size", "2", "--num_actions", "5", "--num_frames", "2",
        "--tokens_per_frame", "3", "--model_dim", "16",
        "--num_decoder_blocks", "1", "--num_heads", "2",
        "--ffn_dim", "32", "--outdir", str(out)])
    assert any(d.startswith("itr_") for d in os.listdir(out))


def test_parallel_train_attn_fleet(tmp_path):
    """Ablation fleet: every variant trains (one process, per-device
    placement — parallel_train_attn.py Config map semantics)."""
    from paddlerobotics_tpu.cli import parallel_train_attn

    out = tmp_path / "fleet"
    parallel_train_attn.main([
        "--variants", "visual_token,without_inst_fm",
        "--synthetic", "2", "--epochs", "1", "--batch_size", "2",
        "--num_actions", "5", "--num_frames", "2", "--tokens_per_frame",
        "3", "--model_dim", "16", "--num_decoder_blocks", "1",
        "--num_heads", "2", "--ffn_dim", "32", "--outdir", str(out)])
    for v in ("visual_token", "without_inst_fm"):
        assert any(d.startswith("itr_") for d in os.listdir(out / v))


def test_prepare_dataset_ds(tmp_path):
    from paddlerobotics_tpu.cli import prepare_dataset

    annos = tmp_path / "annos"
    annos.mkdir()
    with open(annos / "a.txt", "w") as f:
        for i in range(20):
            f.write(f"vid_{i:02d}.mp4 {i * 5} {i % 4} 1 2 30 40\n")
    out = tmp_path / "out"
    prepare_dataset.main(["-dv", "ds", "-ad", str(annos),
                          "-o", str(out), "--test_frac", "0.2"])
    d = json.load(open(out / "dataset.json"))
    assert len(d["train"]) == 16 and len(d["test"]) == 4
    assert d["train"][0]["target_bbox"] == [1.0, 2.0, 30.0, 40.0]


def test_prepare_dataset_salutation(tmp_path):
    from paddlerobotics_tpu.cli import prepare_dataset

    annos = tmp_path / "annos"
    annos.mkdir()
    for v in range(5):
        with open(annos / f"vid_{v:02d}_anno.jsonl", "w") as f:
            f.write(json.dumps({"ID": 1, "Salutation": "uncle"}) + "\n")
            f.write(json.dumps({"ID": 2, "Salutation": "null"}) + "\n")
            f.write(json.dumps({"ID": 3, "Salutation": "aunt"}) + "\n")
    out = tmp_path / "out"
    prepare_dataset.main(["-dv", "salutation", "-ad", str(annos),
                          "-o", str(out), "--test_frac", "0.2"])
    d = json.load(open(out / "salutation.json"))
    assert len(d["train"]) + len(d["test"]) == 10   # nulls dropped
    # split is by video: no video straddles train/test
    tv = {s["video"] for s in d["train"]}
    ev = {s["video"] for s in d["test"]}
    assert not (tv & ev)


def test_collect_data_cli(tmp_path):
    """Tracking preprocessor end-to-end on a synthetic clip with the
    tiny darknet detector (collect_v2_data.py: per-video _track.mp4 +
    _states.pkl of (track_log, det_log))."""
    cv2 = pytest.importorskip("cv2")
    import pickle

    from paddlerobotics_tpu.cli import collect_data

    clips = tmp_path / "clips"
    clips.mkdir()
    w = cv2.VideoWriter(str(clips / "t01.mp4"),
                        cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    rng = np.random.RandomState(0)
    for _ in range(4):
        w.write(rng.randint(0, 255, (48, 64, 3), np.uint8))
    w.release()

    cfg_path = tmp_path / "tiny.cfg"
    cfg_path.write_text(TINY_CFG)
    out = tmp_path / "out"
    collect_data.main(["-d", str(clips), "-o", str(out),
                       "--darknet_cfg", str(cfg_path),
                       "--score_threshold", "0.0"])
    logs = pickle.load(open(out / "t01_states.pkl", "rb"))
    assert len(logs) == 4
    track_log, det_log = logs[0]
    assert isinstance(track_log, dict) and isinstance(det_log, list)
    assert (out / "t01_track.mp4").exists()
