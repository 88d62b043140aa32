"""Incremental windowed rotation averaging (engine/) tests."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsc

from irotavg_tpu import so3
from irotavg_tpu.engine import IncrementalRotAvg


def _sim_sequence(n=40, vg_win=4, noise_deg=1.0, seed=0):
    """Simulated keyframe stream: ground-truth rotations + windowed edges
    mirroring the reference's view-graph windowing (win_size=4 connections
    back per accepted keyframe, src/IRotAvg.cpp:159)."""
    rng = np.random.default_rng(seed)
    R_gt = Rsc.random(n, random_state=rng)
    q_gt = R_gt.as_quat()

    def rel(i, j):
        r = R_gt[j] * R_gt[i].inv()
        noise = Rsc.from_rotvec(
            rng.normal(scale=np.deg2rad(noise_deg), size=3)
        )
        return (noise * r).as_quat()

    return q_gt, rel


def _gauge_align(Q, q_gt):
    """Align both fields to the frame of view 0."""
    a = so3.qmul(Q, np.tile(so3.qinv_flipw(Q[0]), (len(Q), 1)))
    b = so3.qmul(q_gt, np.tile(so3.qinv_flipw(q_gt[0]), (len(q_gt), 1)))
    return np.degrees(np.asarray(so3.qgeodesic(so3.qnormalize(a), b)))


def test_incremental_tracks_ground_truth():
    n, vg_win = 40, 4
    q_gt, rel = _sim_sequence(n=n)
    eng = IncrementalRotAvg()
    for j in range(n):
        eng.add_view()
        for d in range(1, vg_win + 1):
            i = j - d
            if i >= 0:
                eng.add_edge(i, j, rel(i, j))
        if j == 0:
            eng.fix_pose(0)  # anchor the gauge
        else:
            # warm start: initialise the new view by chaining, like the
            # front-end does by construction (pose comes from findRelativePose)
            eng.Q[j] = so3.qmul(rel(j - 1, j), eng.Q[j - 1])
            eng.rot_avg(10)
    err = _gauge_align(eng.Q, q_gt)
    # drift accumulates ~ noise * sqrt(n); 1 deg noise over 40 views
    assert err.mean() < 2.0, f"mean drift {err.mean():.2f} deg"


def test_rot_avg_skips_small_or_sparse():
    eng = IncrementalRotAvg()
    eng.add_view()
    assert eng.rot_avg(10) is None  # win_size clamps to 1 -> < 2
    eng.add_view()
    eng.add_edge(0, 1, [0, 0, 0, 1])
    # 2 views, 1 edge, win_size=2 -> edges(1) < win(2): skip
    assert eng.rot_avg(2) is None


def test_fixed_poses_never_move():
    n = 12
    q_gt, rel = _sim_sequence(n=n, noise_deg=2.0, seed=5)
    eng = IncrementalRotAvg()
    for j in range(n):
        eng.add_view()
        for d in (1, 2):
            if j - d >= 0:
                eng.add_edge(j - d, j, rel(j - d, j))
        if j > 0:
            eng.Q[j] = so3.qmul(rel(j - 1, j), eng.Q[j - 1])
    eng.fix_pose(0)
    eng.fix_pose(5, q_gt[5])
    pinned = eng.Q[[0, 5]].copy()
    stats = eng.rot_avg(n)  # near-global solve
    assert stats is not None and stats["f"] >= 2
    np.testing.assert_array_equal(eng.Q[[0, 5]], pinned)


def test_global_resolve_reduces_drift():
    """A quasi-global rot_avg after 'loop closure' must beat pure chaining."""
    n = 60
    q_gt, rel = _sim_sequence(n=n, noise_deg=2.0, seed=2)
    eng = IncrementalRotAvg()
    for j in range(n):
        eng.add_view()
        for d in (1, 2, 3, 4):
            if j - d >= 0:
                eng.add_edge(j - d, j, rel(j - d, j))
        if j == 0:
            eng.fix_pose(0)
        else:
            eng.Q[j] = so3.qmul(rel(j - 1, j), eng.Q[j - 1])
    drift_before = _gauge_align(eng.Q, q_gt).mean()
    # loop-closure edge + global solve (reference: rotAvg(5000000))
    eng.add_edge(0, n - 1, rel(0, n - 1))
    eng.rot_avg(5_000_000)
    drift_after = _gauge_align(eng.Q, q_gt).mean()
    assert drift_after < drift_before


def test_bucketing_reuses_compilations():
    from irotavg_tpu.engine.incremental import _window_solver

    _window_solver.cache_clear()
    q_gt, rel = _sim_sequence(n=30, seed=3)
    eng = IncrementalRotAvg()
    for j in range(30):
        eng.add_view()
        for d in (1, 2, 3):
            if j - d >= 0:
                eng.add_edge(j - d, j, rel(j - d, j))
        if j == 0:
            eng.fix_pose(0)
        else:
            eng.Q[j] = so3.qmul(rel(j - 1, j), eng.Q[j - 1])
            eng.rot_avg(10)
    # 29 solves must share a handful of bucketed executables
    assert _window_solver.cache_info().currsize <= 3


def test_large_window_cg_backend_agrees_with_dense():
    """Above ``dense_n_max`` the quasi-global re-solve must switch to the
    matrix-free CG backend (f32) and agree with the dense f64 path.

    This is the scaling escape hatch for the reference's rotAvg(5000000)
    contract (src/IRotAvg.cpp:371-378) — at KITTI scale a dense n^2
    Laplacian in f64 would be ~0.5 GB per factorisation."""
    n = 220
    q_gt, rel = _sim_sequence(n=n, noise_deg=1.5, seed=7)

    def build(**kw):
        eng = IncrementalRotAvg(**kw)
        for j in range(n):
            eng.add_view()
            for d in (1, 2, 3):
                if j - d >= 0:
                    eng.add_edge(j - d, j, rel(j - d, j))
            if j == 0:
                eng.fix_pose(0)
            else:
                eng.Q[j] = so3.qmul(rel(j - 1, j), eng.Q[j - 1])
        eng.add_edge(0, n - 1, rel(0, n - 1))  # loop edge
        return eng

    # seeds inside rel() are stateful: rebuild the generator per engine
    eng_dense = build()
    stats_d = eng_dense.rot_avg(5_000_000)
    assert stats_d["backend"] == "dense"

    q_gt2, rel2 = _sim_sequence(n=n, noise_deg=1.5, seed=7)

    def build2(**kw):
        eng = IncrementalRotAvg(**kw)
        for j in range(n):
            eng.add_view()
            for d in (1, 2, 3):
                if j - d >= 0:
                    eng.add_edge(j - d, j, rel2(j - d, j))
            if j == 0:
                eng.fix_pose(0)
            else:
                eng.Q[j] = so3.qmul(rel2(j - 1, j), eng.Q[j - 1])
        eng.add_edge(0, n - 1, rel2(0, n - 1))
        return eng

    eng_cg = build2(dense_n_max=128, large_dtype=np.float32)
    stats_c = eng_cg.rot_avg(5_000_000)
    assert stats_c["backend"] == "cg"
    assert stats_c["solve_dtype"] == "float32"

    # same input edges (same rng stream) -> solutions must agree closely
    gd = np.degrees(np.asarray(so3.qgeodesic(
        so3.qnormalize(eng_dense.Q), so3.qnormalize(eng_cg.Q))))
    assert gd.max() < 0.05, f"max dense-vs-cg divergence {gd.max():.4f} deg"


def test_save_poses_format(tmp_path):
    eng = IncrementalRotAvg()
    eng.add_view()
    eng.add_view(so3.qnormalize(np.array([0.1, 0.2, 0.3, 0.9])))
    p = tmp_path / "poses.txt"
    eng.save_poses(str(p))
    lines = p.read_text().strip().split("\n")
    assert len(lines) == 2
    first = lines[0].split("\t")
    assert first[0] == "0"
    assert len(first) == 8
    # identity rotation, zero translation, scientific notation
    assert float(first[1]) == 1.0 and "e" in first[1]
    assert all(float(v) == 0.0 for v in first[5:])
