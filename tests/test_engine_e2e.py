"""End-to-end engine test: synthetic sequence -> view graph -> rotations."""

import numpy as np
import pytest

from seqgen import make_sequence
from irotavg_tpu import so3
from irotavg_tpu.frontend import Camera, Frame, ORBExtractor
from irotavg_tpu.engine.viewgraph import ViewGraph


@pytest.fixture(scope="module")
def tracked():
    # yaw opposite to the translation direction so image motion adds up
    # (same-sign pan + translate nearly cancels optic flow -> keyframe
    # gate would correctly drop most frames)
    frames, K, R_gt = make_sequence(n_frames=12, seed=1, step=0.3,
                                    yaw_deg_per_frame=-1.0)
    cam = Camera(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                 width=640, height=480)
    ext = ORBExtractor(n_features=1200, n_levels=8)
    vg = ViewGraph(cam, min_matches=60)
    kept = []
    for i, im in enumerate(frames):
        f = Frame(i, im, ext, cam)
        if vg.process_frame(f, win_size=4):
            kept.append(i)
            vg.rot_avg(10)
    return vg, R_gt, kept


def test_sequence_tracks_and_connects(tracked):
    vg, R_gt, kept = tracked
    assert vg.num_views >= 10, f"only {vg.num_views} keyframes accepted"
    # window connections: most views link to >= 2 older views
    multi = sum(1 for i in range(2, vg.num_views)
                if len(vg.adjacency.get(i, {})) >= 2)
    assert multi >= vg.num_views - 4


def test_rotations_match_ground_truth(tracked):
    vg, R_gt, kept = tracked
    q_est = vg.ra.Q
    q_gt = np.stack([
        np.asarray(so3.rotmat_to_quat(R_gt[i])) for i in kept
    ])
    # gauge-align both to view 0
    qa = so3.qmul(q_est, np.tile(so3.qinv_flipw(q_est[0]), (len(q_est), 1)))
    qb = so3.qmul(q_gt, np.tile(so3.qinv_flipw(q_gt[0]), (len(q_gt), 1)))
    err = np.degrees(np.asarray(so3.qgeodesic(so3.qnormalize(qa), qb)))
    assert err.mean() < 1.0, f"mean rotation error {err.mean():.2f} deg"
    assert err.max() < 2.5, f"max rotation error {err.max():.2f} deg"


def test_still_camera_rejected_as_keyframe():
    frames, K, _ = make_sequence(n_frames=2, seed=2, step=0.0,
                                 yaw_deg_per_frame=0.0)
    cam = Camera(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                 width=640, height=480)
    ext = ORBExtractor(n_features=800, n_levels=4)
    vg = ViewGraph(cam, min_matches=60)
    assert vg.process_frame(Frame(0, frames[0], ext, cam))
    # identical frame: zero motion -> local_rad < 5 -> rejected
    assert not vg.process_frame(Frame(1, frames[1], ext, cam))
    assert vg.num_views == 1


def test_loop_closure_path(tracked):
    """close_loop connects two overlapping views via BoW-free matching."""
    vg, _, _ = tracked
    # views 0 and 2 overlap heavily but may not be directly connected if
    # beyond the window; force the loop-closure machinery between them
    i, j = 0, min(3, vg.num_views - 1)
    key = (i, j)
    existing = key in vg.connections
    ok = vg.close_loop(j, i, min_matches=60)
    assert ok or existing


def test_consistency_state_machine(tracked):
    vg, _, _ = tracked
    vg._consistent_groups = []
    vg.COVISIBILITY_CONSISTENCY_TH = 3
    # the same candidate group seen 3 times in a row becomes consistent
    out1 = vg.check_loop_consistency([1])
    out2 = vg.check_loop_consistency([1])
    out3 = vg.check_loop_consistency([1])
    out4 = vg.check_loop_consistency([1])
    assert out1 == [] and out2 == [] and out3 == []
    assert out4 == [1]
    vg.COVISIBILITY_CONSISTENCY_TH = 7
