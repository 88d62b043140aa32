"""Checkpoint/resume: engine state round-trips and resumes bit-identically."""

import numpy as np
import pytest

from seqgen import make_sequence
from irotavg_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
from irotavg_tpu.engine.viewgraph import ViewGraph
from irotavg_tpu.frontend import Camera, Frame, ORBExtractor


@pytest.fixture(scope="module")
def seq():
    frames, K, R_gt = make_sequence(n_frames=10, seed=11, step=0.3,
                                    yaw_deg_per_frame=-1.0)
    cam = Camera(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                 width=640, height=480)
    ext = ORBExtractor(n_features=1000, n_levels=8)
    return frames, cam, ext


def _drive(vg, frames, ext, cam, start, stop):
    for i in range(start, stop):
        if vg.process_frame(Frame(i, frames[i], ext, cam), win_size=4):
            vg.rot_avg(10)


def test_checkpoint_roundtrip_and_resume(seq, tmp_path):
    frames, cam, ext = seq
    mid, end = 6, 10

    # uninterrupted run
    vg_full = ViewGraph(cam, min_matches=60)
    _drive(vg_full, frames, ext, cam, 0, end)

    # interrupted run: save at mid, load, continue
    vg_a = ViewGraph(cam, min_matches=60)
    _drive(vg_a, frames, ext, cam, 0, mid)
    path = tmp_path / "ck.npz"
    save_checkpoint(vg_a, str(path), extra={"count": mid})
    vg_b, extra = load_checkpoint(str(path), cam)
    assert int(extra["count"]) == mid

    # loaded state matches the saver exactly
    np.testing.assert_array_equal(vg_b.ra.Q, vg_a.ra.Q)
    np.testing.assert_array_equal(vg_b.ra.edges, vg_a.ra.edges)
    np.testing.assert_array_equal(vg_b.ra.QQ, vg_a.ra.QQ)
    assert vg_b.local_rad == vg_a.local_rad
    assert set(vg_b.connections) == set(vg_a.connections)
    for k in vg_a.connections:
        np.testing.assert_array_equal(vg_b.connections[k].pairs,
                                      vg_a.connections[k].pairs)
    assert vg_b.adjacency == vg_a.adjacency
    for fa, fb in zip(vg_a.frames, vg_b.frames):
        np.testing.assert_array_equal(fa.desc, fb.desc)
        np.testing.assert_array_equal(fa.valid, fb.valid)
        np.testing.assert_array_equal(fa.xu, fb.xu)

    # resumed run reproduces the uninterrupted one
    _drive(vg_b, frames, ext, cam, mid, end)
    assert vg_b.num_views == vg_full.num_views
    assert set(vg_b.connections) == set(vg_full.connections)
    np.testing.assert_allclose(vg_b.ra.Q, vg_full.ra.Q, atol=1e-12)


def test_checkpoint_preserves_bow_and_db(seq, tmp_path):
    frames, cam, ext = seq
    from irotavg_tpu.placerec.vocabulary import train_vocabulary

    vg = ViewGraph(cam, min_matches=60)
    _drive(vg, frames, ext, cam, 0, 4)
    descs = [f.desc[f.valid] for f in vg.frames]
    vocab = train_vocabulary(descs, k=4, L=3, seed=0)
    for f in vg.frames:
        f.compute_bow(vocab, levelsup=1)
    for i in range(vg.num_views):
        vg.add_to_database(i)
    vg._consistent_groups = [({1, 2}, 3)]

    path = tmp_path / "ck.npz"
    save_checkpoint(vg, str(path))
    vg2, _ = load_checkpoint(str(path), cam)

    assert vg2._consistent_groups == [({1, 2}, 3)]
    assert set(vg2.db.bows) == set(vg.db.bows)
    for i, f in enumerate(vg.frames):
        f2 = vg2.frames[i]
        assert f2.bow is not None and f.bow is not None
        assert set(f2.bow) == set(f.bow)
        for w in f.bow:
            assert f2.bow[w] == pytest.approx(f.bow[w])
        np.testing.assert_array_equal(f2.feat_nodes, f.feat_nodes)
    # loop candidates behave identically post-restore
    assert (vg2.detect_loop_candidates(vg2.num_views - 1)
            == vg.detect_loop_candidates(vg.num_views - 1))
