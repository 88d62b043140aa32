"""The full incremental rotation-averaging SLAM CLI — parity with the
reference `irotavg` binary (src/IRotAvg.cpp:132-398).

    python -m irotavg_tpu.app.irotavg VOCAB CONFIG SEQUENCE_PATH
        [--image_ext .png] [--timestamp_offset 0] [--gt FILE]
        [--max_frames N] [--out_dir DIR] [--no_loop_closure]
        [--trace_dir DIR]

Per frame (src/IRotAvg.cpp:251-392): Frame creation (extract + undistort +
grid + BoW) -> ViewGraph.process_frame (skip if not keyframe) -> loop
closure (candidates -> consistency -> BoW match -> essential RANSAC ->
refine -> connect, min 150 inliers) -> optional GT `fix_pose` every 20 ids
-> rot_avg(10) locally or a quasi-global solve after loop closure / GT
correction -> per-frame timing line -> checkpoint every 5 ids.

Outputs: ``rotavg_poses.txt`` (id, qw qx qy qz, 0 0 0 — translations are
never estimated) and ``rotavg_poses_ids.txt`` (1-based ids of selected
frames), formats at src/ViewGraph.cpp:1206-1231 / src/IRotAvg.cpp:111-128.

Divergences from the reference (documented, intentional):
* ``VOCAB`` may be ``none`` to run without place recognition (the
  reference hard-requires a vocabulary even with loop closure disabled).
* ``--max_frames``/``--out_dir``/``--trace_dir`` are additions; defaults
  reproduce reference behaviour.
* No GUI windows (the reference pops cv::imshow match windows
  unconditionally; headless here).
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="irotavg",
        description="Incremental rotation averaging over an image sequence",
    )
    p.add_argument("orb_vocabulary",
                   help="ORB vocabulary (text format), or 'none'")
    p.add_argument("config", help="ORB-SLAM-compatible YAML settings")
    p.add_argument("sequence_path", help="path to images")
    p.add_argument("--image_ext", default=".png")
    p.add_argument("--timestamp_offset", type=int, default=0)
    p.add_argument("--gt", default=None,
                   help="ground-truth orientations (9 numbers per line)")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--out_dir", default=".")
    p.add_argument("--no_loop_closure", action="store_true")
    p.add_argument("--trace_dir", default=None,
                   help="write a jax.profiler trace here")
    p.add_argument("--checkpoint", action="store_true",
                   help="write a restartable engine snapshot "
                        "(checkpoint.npz in --out_dir) at each save point")
    p.add_argument("--resume", default=None, metavar="SNAPSHOT",
                   help="resume from a checkpoint.npz snapshot")
    p.add_argument("--plot_matches", default=None, metavar="DIR",
                   help="save per-keyframe match images (PNG) to DIR — "
                        "headless equivalent of the reference's GUI "
                        "windows (src/IRotAvg.cpp:93-107)")
    p.add_argument("--prefetch", type=int, default=8, metavar="B",
                   help="look-ahead batched extraction width (frames per "
                        "device program); 0/1 extracts per frame like the "
                        "reference.  Engine decisions are identical either "
                        "way — only when extraction compute runs moves.")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import numpy as np

    from irotavg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from irotavg_tpu import so3
    from irotavg_tpu.config import PipelineConfig, load_settings
    from irotavg_tpu.engine.viewgraph import FrameConnectionError, ViewGraph
    from irotavg_tpu.frontend import (
        Camera, Frame, FramePrefetcher, ORBExtractor,
    )
    from irotavg_tpu.utils import (
        SequenceLoader, StageTimer, device_trace, load_gray,
    )

    cfg = PipelineConfig()
    cam_cfg, orb_cfg = load_settings(args.config)

    vocab = None
    if args.orb_vocabulary.lower() not in ("none", "-", ""):
        from irotavg_tpu.placerec.vocabulary import Vocabulary

        print("loading vocabulary...")
        vocab = Vocabulary.load_text(args.orb_vocabulary)

    gt_rots = None
    if args.gt is not None:
        data = np.loadtxt(args.gt)
        if data.ndim == 1:
            data = data[None]
        if data.shape[1] != 9:
            print(f"bad GT file: expected 9 columns, got {data.shape[1]}",
                  file=sys.stderr)
            return 1
        gt_rots = data.reshape(-1, 3, 3)

    extractor = ORBExtractor(
        n_features=orb_cfg.n_features,
        scale_factor=orb_cfg.scale_factor,
        n_levels=orb_cfg.n_levels,
        ini_th_fast=orb_cfg.ini_th_fast,
        min_th_fast=orb_cfg.min_th_fast,
    )
    loader = SequenceLoader(args.sequence_path, args.image_ext,
                            args.timestamp_offset)
    if len(loader) == 0:
        print(f"no {args.image_ext} images in {args.sequence_path}",
              file=sys.stderr)
        return 1

    print(f"K:\n[{cam_cfg.fx} 0 {cam_cfg.cx}; 0 {cam_cfg.fy} {cam_cfg.cy}; "
          f"0 0 1]")
    print(f"dist coefs: [{cam_cfg.k1} {cam_cfg.k2} {cam_cfg.p1} "
          f"{cam_cfg.p2}]")

    detect_loop_closure = cfg.loop.enabled and not args.no_loop_closure \
        and vocab is not None

    camera = None
    vg = None
    timer = StageTimer()
    os.makedirs(args.out_dir, exist_ok=True)
    poses_path = os.path.join(args.out_dir, "rotavg_poses.txt")
    ids_path = os.path.join(args.out_dir, "rotavg_poses_ids.txt")
    ckpt_path = os.path.join(args.out_dir, "checkpoint.npz")
    selected_frames: list[int] = []

    frame_id = 0
    count = 0
    skip_until = 0
    if args.resume is not None:
        from irotavg_tpu.engine.checkpoint import load_checkpoint

        im0 = load_gray(loader[0][1])
        camera = Camera(
            fx=cam_cfg.fx, fy=cam_cfg.fy, cx=cam_cfg.cx, cy=cam_cfg.cy,
            k1=cam_cfg.k1, k2=cam_cfg.k2, p1=cam_cfg.p1, p2=cam_cfg.p2,
            width=im0.shape[1], height=im0.shape[0],
        )
        vg, extra = load_checkpoint(args.resume, camera)
        skip_until = int(extra["count"])
        frame_id = int(extra["frame_id"])
        selected_frames = [int(v) for v in extra["selected_frames"]]
        print(f"resumed at source frame {skip_until} "
              f"({vg.num_views} keyframes)")
    # enumerate the frames the loop will process (sampling + resume skip)
    # up front, keeping the reference's 1-based running count per frame —
    # this is what lets extraction run as batched look-ahead programs
    todo: list[tuple[int, str]] = []
    for count, (_ts, impath) in enumerate(loader):
        if count < skip_until or count % cfg.sampling_step != 0:
            continue
        todo.append((count + 1, impath))
    count = skip_until   # advances to each processed frame's 1-based count
                         # (the resume cursor written into checkpoints)

    if todo and camera is None:
        im0 = load_gray(todo[0][1])
        camera = Camera(
            fx=cam_cfg.fx, fy=cam_cfg.fy, cx=cam_cfg.cx, cy=cam_cfg.cy,
            k1=cam_cfg.k1, k2=cam_cfg.k2, p1=cam_cfg.p1, p2=cam_cfg.p2,
            width=im0.shape[1], height=im0.shape[0],
        )
    if vg is None and camera is not None:
        vg = ViewGraph(camera, min_matches=cfg.vg_min_matches)

    # keep_image (match plotting) needs the raw pixels on the Frame, which
    # the batched path does not retain — fall back to per-frame extraction
    use_prefetch = args.prefetch > 1 and args.plot_matches is None
    if use_prefetch:
        pf = FramePrefetcher(
            [(lambda p=impath: load_gray(p)) for _, impath in todo],
            extractor, camera, batch=args.prefetch, vocab=vocab,
        )

    with device_trace(args.trace_dir):
        for k, (count1, impath) in enumerate(todo):
            if args.max_frames is not None and frame_id >= args.max_frames:
                break
            count = count1

            with timer.stage("frame_creation"):
                if use_prefetch:
                    frame = pf.frame(k)
                    frame.id = frame_id
                else:
                    image = load_gray(impath)
                    frame = Frame(frame_id, image, extractor, camera,
                                  vocab=vocab,
                                  keep_image=args.plot_matches is not None)

            with timer.stage("frame_processing"):
                try:
                    selected = vg.process_frame(frame,
                                                win_size=cfg.vg_win_size)
                except FrameConnectionError as e:
                    # the reference std::exits here (src/ViewGraph.cpp:1083)
                    print(f"Not enough matches: {e}", file=sys.stderr)
                    return -1
                if not selected:
                    print(f"skipping frame - local rad = {vg.local_rad}\n")
                    continue
                selected_frames.append(count1)
                view_id = vg.num_views - 1

                if args.plot_matches is not None and view_id > 0:
                    from irotavg_tpu.utils.viz import plot_matches

                    os.makedirs(args.plot_matches, exist_ok=True)
                    conn = vg.connections.get((view_id - 1, view_id))
                    if (conn is not None
                            and vg.frames[view_id - 1].image is not None):
                        plot_matches(
                            vg.frames[view_id - 1], vg.frames[view_id],
                            conn.pairs,
                            os.path.join(args.plot_matches,
                                         f"matches_{frame_id:06d}.png"),
                        )

                loop_new_connections = False
                if detect_loop_closure:
                    candidates = vg.detect_loop_candidates(view_id)
                    consistent = vg.check_loop_consistency(candidates) \
                        if candidates else []
                    if consistent:
                        print(" * * * loop closure detected * * *\n")
                    for cand in consistent:
                        if vg.close_loop(view_id, cand,
                                         min_matches=cfg.loop.min_matches):
                            print(f"   new connection: ( {cand}, {view_id} )")
                            loop_new_connections = True
                    vg.add_to_database(view_id)

            with timer.stage("rotavg"):
                add_correction = gt_rots is not None and frame_id % \
                    cfg.gt_fix_every == 0
                if add_correction:
                    gi = frame_id * cfg.sampling_step
                    if gi < len(gt_rots):
                        q = so3.rotmat_to_quat(gt_rots[gi])
                        vg.fix_pose(view_id, np.asarray(q))
                        print(f"Fixing pose for view id {frame_id}")
                if loop_new_connections or add_correction:
                    vg.rot_avg(cfg.global_win_size)
                else:
                    vg.rot_avg(cfg.rotavg_win_size)

            print(timer.frame_line(frame_id))
            if frame_id % cfg.save_every == 0:
                vg.save_poses(poses_path)
                _save_ids(ids_path, selected_frames)
                if args.checkpoint:
                    from irotavg_tpu.engine.checkpoint import save_checkpoint

                    save_checkpoint(vg, ckpt_path, extra={
                        "count": count1,
                        "frame_id": frame_id + 1,
                        "selected_frames": selected_frames,
                    })
            frame_id += 1

    if vg is not None:
        vg.save_poses(poses_path)
        _save_ids(ids_path, selected_frames)
        if args.checkpoint:
            from irotavg_tpu.engine.checkpoint import save_checkpoint

            save_checkpoint(vg, ckpt_path, extra={
                "count": count,
                "frame_id": frame_id,
                "selected_frames": selected_frames,
            })
    for name, s in timer.summary().items():
        print(f"{name}: total {s['total_s']:.3f}s over {s['count']} "
              f"frames (mean {s['mean_s'] * 1e3:.1f} ms)")
    return 0


def _save_ids(path: str, selected: list[int]) -> None:
    """`saveSelectedFramesIds` (src/IRotAvg.cpp:111-128): the 1-based
    running count at selection time, one per line."""
    with open(path, "w") as fh:
        for v in selected:
            fh.write(f"{v}\n")


if __name__ == "__main__":
    sys.exit(main())
