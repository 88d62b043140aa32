"""Dev tool: per-stage breakdown of the incremental engine's steady state.

Runs a short synthetic sequence on the session device and times, with
explicit block_until_ready fences, each per-frame component:
  extract   — ORB extraction device program
  phase1    — fused_initial_pose (match + RANSAC + adaptive radius)
  phase2    — fused_refine_window (refine loop + window walk), accepted only
  rotavg    — the windowed solve dispatch + (sync) fetch

This intentionally serialises stages the engine overlaps, so the numbers
are *component costs*, not the pipelined wall time.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main(n_frames=60):
    import jax

    from seqgen import make_sequence
    from irotavg_tpu.engine.viewgraph import FrameConnectionError, ViewGraph
    from irotavg_tpu.frontend import Camera, Frame, ORBExtractor
    from irotavg_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    frames, K, R_gt = make_sequence(n_frames=n_frames, seed=5, loop=True)
    cam = Camera(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                 width=640, height=480)
    ext = ORBExtractor(n_features=1000, n_levels=8)
    vg = ViewGraph(cam, min_matches=50)

    t = {"extract": [], "process_rej": [], "process_acc": [], "rotavg": []}
    warm = n_frames // 3
    for i, im in enumerate(frames):
        t0 = time.perf_counter()
        f = Frame(i, im, ext, cam)
        # fence: force extraction to finish so process_frame timing is pure
        jax.block_until_ready(f._device["desc"])
        t1 = time.perf_counter()
        try:
            ok = vg.process_frame(f, win_size=4)
        except FrameConnectionError:
            ok = False
        t2 = time.perf_counter()
        if ok:
            vg.rot_avg(10, lazy=False)
        t3 = time.perf_counter()
        if i >= warm:
            t["extract"].append(t1 - t0)
            t["process_acc" if ok else "process_rej"].append(t2 - t1)
            if ok:
                t["rotavg"].append(t3 - t2)

    for k, v in t.items():
        if v:
            print(f"{k:10s} n={len(v):3d}  p50={np.median(v)*1e3:7.1f} ms  "
                  f"p90={np.percentile(v, 90)*1e3:7.1f} ms  "
                  f"total={np.sum(v):6.2f} s")
    print(f"keyframes: {vg.num_views}/{n_frames}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 60)
