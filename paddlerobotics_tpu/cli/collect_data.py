"""Tracking preprocessor for dataset-v2 annotation (rebuild of
scripts/collect_v2_data.py): for every video clip, run person detection
+ Deep-SORT tracking and write

    <task>_track.mp4    frames annotated with track ids + detections
    <task>_states.pkl   per-frame (track_log: {track_id: tlbr},
                        det_log: [tlbr]) — the exact structure the
                        reference's annotation platform and
                        prepare_dataset.py consume

Supports the reference's worker split (--workers/--current_worker) and
--resume <task_id>. Detector/ReID weights come from a darknet .weights
import or a flax msgpack; absent weights fall back to random init
(pipeline smoke — detections are meaningless but the format is real).
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video_dir", "-d", default="data/clips")
    p.add_argument("--output_dir", "-o", default="")
    p.add_argument("--encoder_params", type=str, default="",
                   help="flax msgpack for the ReID encoder")
    p.add_argument("--darknet_cfg", type=str, default="")
    p.add_argument("--darknet_weights", type=str, default="")
    p.add_argument("--max_cosine_distance", type=float, default=0.3)
    p.add_argument("--score_threshold", type=float, default=0.25)
    p.add_argument("--workers", "-w", type=int, default=1)
    p.add_argument("--current_worker", "-c", type=int, default=1)
    p.add_argument("--resume", type=str, default=None,
                   help="task id (video basename) to resume from")
    p.add_argument("--max_frames", type=int, default=0,
                   help="cap frames per video (0 = all)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from paddlerobotics_tpu.hri import tracker as trk
    from paddlerobotics_tpu.hri.perception.reid import MarsSmall128
    from paddlerobotics_tpu.hri.perception.scene import SceneSensor
    from paddlerobotics_tpu.hri.video import (VideoWriter,
                                              clip_video_to_frames,
                                              draw_instances)

    out_dir = args.output_dir or args.video_dir
    os.makedirs(out_dir, exist_ok=True)

    if args.darknet_cfg:
        from paddlerobotics_tpu.hri.perception import darknet
        from paddlerobotics_tpu.hri.perception.scene import \
            DarknetSceneSensor

        sections = darknet.parse_cfg(open(args.darknet_cfg).read())
        scene = DarknetSceneSensor(sections)
        scene_params = scene.init(jax.random.key(0))
        if args.darknet_weights:
            scene_params = darknet.load_darknet_weights(
                scene_params, sections, args.darknet_weights)
    else:
        scene = SceneSensor()
        scene_params = scene.init(jax.random.key(0))

    reid = MarsSmall128()
    reid_params = reid.init(jax.random.key(2),
                            jnp.zeros((1, 128, 64, 3)))
    if args.encoder_params:
        from flax import serialization

        with open(args.encoder_params, "rb") as f:
            reid_params = serialization.from_bytes(reid_params, f.read())

    detect = jax.jit(lambda img: scene.get_instances_with_feats(
        scene_params, img, score_threshold=args.score_threshold))
    encode = jax.jit(lambda crops: reid.apply(reid_params, crops))
    update = jax.jit(lambda st, b, f, v: trk.tracker_update(
        st, b, f, v, max_cosine_distance=args.max_cosine_distance))
    predict = jax.jit(trk.tracker_predict)

    videos = sorted(glob.glob(os.path.join(args.video_dir, "*.mp4")))
    tasks = [v for i, v in enumerate(videos)
             if i % args.workers == args.current_worker - 1]
    resume = args.resume
    if resume is not None and resume not in [
            os.path.basename(v)[:-len(".mp4")] for v in tasks]:
        raise SystemExit(
            f"--resume {resume!r} is not in worker "
            f"{args.current_worker}/{args.workers}'s shard — nothing "
            f"would run (shard tasks: "
            f"{[os.path.basename(v) for v in tasks][:5]}…)")

    for video_file in tasks:
        task_id = os.path.basename(video_file)[:-len(".mp4")]
        if resume is not None:
            if resume != task_id:
                continue
            resume = None

        frames = clip_video_to_frames(video_file)
        if args.max_frames:
            frames = frames[:args.max_frames]
        writer = VideoWriter(
            os.path.join(out_dir, f"{task_id}_track.mp4"))
        state = trk.init_tracker()
        logs = []
        S = scene.input_size
        for frame in frames:
            h, w = frame.shape[:2]
            img = cv2.resize(frame, (S, S)).astype(np.float32) / 255.0
            inst = detect(img[None])
            boxes = np.asarray(inst.boxes[0])       # (K,4) in S coords
            valid = np.asarray(inst.valid[0]).astype(bool)
            # ReID features from person crops (re_id.py extract_image_patch)
            crops = np.zeros((boxes.shape[0], 128, 64, 3), np.float32)
            scale = np.array([w / S, h / S, w / S, h / S])
            fboxes = boxes * scale                  # frame coords
            for i, (b, v) in enumerate(zip(fboxes, valid)):
                if not v:
                    continue
                x0, y0, x1, y1 = [int(max(c, 0)) for c in b]
                patch = frame[y0:max(y1, y0 + 1), x0:max(x1, x0 + 1)]
                if patch.size == 0:
                    continue
                crops[i] = cv2.resize(patch, (64, 128)) / 255.0
            feats = np.asarray(encode(jnp.asarray(crops)))

            state = predict(state)
            state, det_tid = update(state, jnp.asarray(fboxes),
                                    jnp.asarray(feats),
                                    jnp.asarray(valid))
            det_tid = np.asarray(det_tid)

            track_log = {str(int(t)): fboxes[i].tolist()
                         for i, t in enumerate(det_tid)
                         if t > 0 and valid[i]}
            det_log = [fboxes[i].tolist() for i in range(len(valid))
                       if valid[i]]
            logs.append((track_log, det_log))

            labels = [str(int(det_tid[i])) if det_tid[i] > 0 else ""
                      for i in range(len(valid)) if valid[i]]
            vis = draw_instances(frame, det_log, labels=labels)
            writer.write(vis)
        writer.close()
        with open(os.path.join(out_dir, f"{task_id}_states.pkl"),
                  "wb") as f:
            pickle.dump(logs, f)
        print(f"saved {task_id}: {len(logs)} frames")


if __name__ == "__main__":
    main()
