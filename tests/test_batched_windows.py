"""Batched window solver: W independent rotAvg windows in one dispatch.

Validates engine/batched.py against the single-window solver path: same
algorithm, same bucket padding, so results must agree to floating-point
tolerance window by window.
"""

import numpy as np
import pytest

from synth import make_problem
from irotavg_tpu import so3
from irotavg_tpu.engine.batched import pack_windows, solve_windows
from irotavg_tpu.engine.incremental import _window_solver


def _make_windows(W=6, seed=0):
    """Windows shaped like incremental rotAvg(10): ~14 nodes, ~30 edges,
    a few fixed anchors, warm start near the solution."""
    problems = []
    rng = np.random.default_rng(seed)
    for k in range(W):
        n = int(rng.integers(10, 15))
        p = make_problem(n=n, extra_edges=n, noise_deg=2.0,
                         outlier_frac=0.1, seed=100 + k)
        from scipy.spatial.transform import Rotation as Rsc

        pert = Rsc.from_rotvec(
            rng.normal(scale=np.radians(4.0), size=(n, 3))
        )
        Q0 = (pert * Rsc.from_quat(p["Q_gt"])).as_quat()
        f = int(rng.integers(1, 4))
        Q0[:f] = p["Q_gt"][:f]
        problems.append((p["edges"].astype(np.int32), p["QQ"], Q0, f))
    return problems


def test_batched_matches_single_window_solves():
    problems = _make_windows()
    m_pad, n_pad = 64, 16
    Q_list, w_list, iters, score = solve_windows(
        problems, l1_iters=100, irls_iters=100, dtype=np.float64,
        m_pad=m_pad, n_pad=n_pad,
    )
    # reference: the incremental engine's per-bucket single solver
    solve1 = _window_solver(m_pad, n_pad, 100, 100,
                            float(np.radians(5.0)), 1e-3,
                            "Geman-McClure", "float64")
    packed = pack_windows(problems, m_pad, n_pad, np.float64)
    for k, (e, qq, q0, f) in enumerate(problems):
        Q1, w1, it1, _ = solve1(
            packed[0][k], packed[1][k], packed[2][k],
            np.int32(f), packed[4][k], packed[5][k],
        )
        gdeg = np.degrees(np.asarray(
            so3.qgeodesic(so3.qnormalize(np.asarray(Q1)[: len(q0)]),
                          Q_list[k])
        ))
        assert gdeg.max() < 1e-5, f"window {k}: max {gdeg.max()} deg"
        assert int(iters[k]) == int(it1)


def test_batched_windows_accuracy_vs_gt():
    """Each window's solve must improve substantially on its warm start.

    Absolute accuracy on these tiny graphs (n~14, m~27, 10% outliers) is
    limited by the problem, not the solver — the scipy oracle lands at
    3-5 deg mean on identical instances — so the assertion is relative.
    """
    problems = _make_windows(W=8, seed=3)
    Q_list, _, iters, _ = solve_windows(problems, dtype=np.float64)
    for k, (e, qq, q0, f) in enumerate(problems):
        p = make_problem(n=len(q0), extra_edges=len(q0), noise_deg=2.0,
                         outlier_frac=0.1, seed=100 + k)
        err = np.degrees(np.asarray(so3.qgeodesic(
            so3.qnormalize(Q_list[k]), p["Q_gt"]
        )))
        warm = np.degrees(np.asarray(so3.qgeodesic(
            so3.qnormalize(q0), p["Q_gt"]
        )))
        assert err.mean() < 0.85 * warm.mean(), (
            f"window {k}: solved {err.mean():.2f} vs warm {warm.mean():.2f}"
        )


def test_fixed_rotations_untouched():
    problems = _make_windows(W=4, seed=9)
    Q_list, _, _, _ = solve_windows(problems, dtype=np.float64)
    for (e, qq, q0, f), Qk in zip(problems, Q_list):
        np.testing.assert_allclose(Qk[:f], q0[:f], atol=0)


def test_mixed_convergence_iters_are_per_window():
    """An easy (already-converged) window must not be dragged through the
    hard window's iterations."""
    problems = _make_windows(W=2, seed=5)
    easy = problems[0]
    p = make_problem(n=12, extra_edges=12, noise_deg=0.01,
                     outlier_frac=0.0, seed=77)
    trivial = (p["edges"].astype(np.int32), p["QQ"], p["Q_gt"].copy(), 2)
    Q_list, _, iters, _ = solve_windows([easy, trivial], dtype=np.float64)
    assert int(iters[1]) <= int(iters[0])
