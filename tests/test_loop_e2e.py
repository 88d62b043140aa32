"""Full loop-closure path e2e: revisit detection through the BoW cascade.

Exercises the chain the reference runs per keyframe
(src/IRotAvg.cpp:295-353): vocabulary transform -> min-score floor ->
inverted-file cascade -> consecutive-group consistency -> BoW match +
essential RANSAC + refine -> loop edge -> quasi-global rot_avg."""

import numpy as np
import pytest

from seqgen import make_sequence
from irotavg_tpu import so3
from irotavg_tpu.engine.viewgraph import ViewGraph
from irotavg_tpu.frontend import Camera, Frame, ORBExtractor
from irotavg_tpu.placerec import train_vocabulary


@pytest.fixture(scope="module")
def loop_run():
    frames, K, R_gt = make_sequence(n_frames=14, seed=4, step=0.3,
                                    yaw_deg_per_frame=-1.2, loop=True)
    cam = Camera(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                 width=640, height=480)
    ext = ORBExtractor(n_features=1000, n_levels=8)

    # train a small vocabulary on the sequence's own descriptors (the
    # reference ships ORBvoc.txt; capability is the same)
    sample = []
    for im in frames[::4]:
        out = ext(im)
        d = np.asarray(out["desc"])[np.asarray(out["valid"])]
        sample.append(d[:300])
    vocab = train_vocabulary(sample, k=8, L=3, seed=0)

    vg = ViewGraph(cam, min_matches=60)
    vg.COVISIBILITY_CONSISTENCY_TH = 1  # short synthetic sequence
    loops = []
    kept = []
    for i, im in enumerate(frames):
        f = Frame(i, im, ext, cam, vocab=vocab)
        if not vg.process_frame(f, win_size=4):
            continue
        kept.append(i)
        view_id = vg.num_views - 1
        cands = vg.detect_loop_candidates(view_id)
        for cand in vg.check_loop_consistency(cands):
            if vg.close_loop(view_id, cand, min_matches=60):
                loops.append((cand, view_id))
                vg.rot_avg(5_000_000)      # quasi-global solve
        vg.add_to_database(view_id)
        vg.rot_avg(10)
    return vg, loops, kept, R_gt


def test_loop_edges_created(loop_run):
    vg, loops, kept, _ = loop_run
    assert vg.num_views >= 10
    # at least one loop edge spanning beyond the sliding window
    spans = [j - i for i, j in loops]
    assert loops, "no loop closures detected on the out-and-back sequence"
    assert max(spans) > 4, f"loop edges too short: {spans}"


def test_loop_consistency_filters_first_hit(loop_run):
    vg, loops, kept, _ = loop_run
    # every accepted loop connection exists in the graph with >= 60 matches
    for i, j in loops:
        assert vg.is_connected(i, j)
        assert vg.adjacency[j][i] >= 60


def test_global_solve_accuracy_after_loop(loop_run):
    vg, loops, kept, R_gt = loop_run
    q_est = vg.ra.Q[: vg.num_views]
    q_gt = np.stack([np.asarray(so3.rotmat_to_quat(R_gt[i])) for i in kept])
    qa = so3.qmul(q_est, np.tile(so3.qinv_flipw(q_est[0]), (len(q_est), 1)))
    qb = so3.qmul(q_gt, np.tile(so3.qinv_flipw(q_gt[0]), (len(q_gt), 1)))
    err = np.degrees(np.asarray(so3.qgeodesic(so3.qnormalize(qa), qb)))
    assert err.mean() < 1.5, f"mean rotation error {err.mean():.2f} deg"
