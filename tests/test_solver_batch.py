"""Batch solver tests: IRLS + L1-RA vs. an independent scipy oracle, vs.
synthetic ground truth, and structural properties (gauge, fixed prefix,
padding invariance, backend agreement)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import ref_impl
from synth import make_problem, mean_geodesic_deg

from irotavg_tpu import so3
from irotavg_tpu.solver import RotationGraph, init_mst
from irotavg_tpu.solver.irls import Cost, IRLSConfig, irls
from irotavg_tpu.solver.l1ra import L1RAConfig, l1ra

SIGMA = np.deg2rad(5.0)


def _graph_from(prob, f=1, dtype=jnp.float64, Q0=None):
    n = prob["n"]
    Q = np.zeros((n, 4))
    Q[:, 3] = 1.0
    Q[0] = prob["Q_gt"][0]
    if Q0 is not None:
        Q = Q0
    Q = init_mst(Q, prob["QQ"], prob["edges"], f)
    return RotationGraph.create(prob["edges"], prob["QQ"], Q, f=f, dtype=dtype), Q


def test_irls_exact_on_noiseless_graph():
    prob = make_problem(n=40, extra_edges=80, noise_deg=0.0, seed=0)
    g, _ = _graph_from(prob)
    Q, w, iters, score = irls(g, IRLSConfig(sigma=SIGMA, max_iters=100))
    err = mean_geodesic_deg(np.array(so3.qnormalize(Q)), prob["Q_gt"])
    assert err < 1e-10


def test_irls_recovers_ground_truth():
    prob = make_problem(n=40, extra_edges=80, noise_deg=2.0, seed=0)
    g, Q0 = _graph_from(prob)
    err_init = mean_geodesic_deg(Q0, prob["Q_gt"])
    cfg = IRLSConfig(cost=Cost.GEMAN_MCCLURE, sigma=SIGMA, max_iters=100)
    Q, w, iters, score = irls(g, cfg)
    Q = so3.qnormalize(Q)
    err = mean_geodesic_deg(np.array(Q), prob["Q_gt"])
    # averaging must beat the spanning-tree init by a wide margin and land
    # near the per-edge noise floor (2 deg noise, chain-dominated graph)
    assert err < 0.25 * err_init, f"{err} vs init {err_init}"
    assert err < 2.5, f"mean geodesic err {err} deg"
    assert int(iters) < 100


def test_irls_matches_scipy_oracle():
    prob = make_problem(n=30, extra_edges=50, noise_deg=3.0,
                        outlier_frac=0.1, seed=1)
    f = 1
    g, Q0 = _graph_from(prob, f=f)
    for cost_jax, cost_ref in [
        (Cost.GEMAN_MCCLURE, "Geman-McClure"),
        (Cost.L1, "L1"),
        (Cost.HUBER, "Huber"),
        (Cost.CAUCHY, "Cauchy"),
        (Cost.TALWAR, "Talwar"),
        (Cost.WELSCH, "Welsch"),
        (Cost.ANDREWS, "Andrews"),
    ]:
        cfg = IRLSConfig(cost=cost_jax, sigma=SIGMA, max_iters=20,
                         change_th=1e-5)
        Q, w, iters, score = irls(g, cfg)
        A = ref_impl.make_A(prob["n"], f, prob["edges"])
        Q_ref, w_ref, it_ref, score_ref = ref_impl.irls(
            prob["QQ"], prob["edges"], A, cost_ref, SIGMA, Q0, f, 20, 1e-5
        )
        if not np.isfinite(Q_ref).all():
            # A cost that zeroes weights (e.g. Talwar) can make the normal
            # equations singular; the oracle then NaNs and halts (the C++
            # reference would abort, ral/l1_irls.cpp:149-177).  Our policy
            # is never-NaN (solver/graph.py:laplacian_cho_solve), so exact
            # parity is impossible past the singular iteration — assert the
            # documented divergence instead (quality covered by
            # test_solver_robust.py).
            assert np.isfinite(np.array(Q)).all(), str(cost_jax)
            continue
        assert int(iters) == it_ref, (cost_jax, int(iters), it_ref)
        np.testing.assert_allclose(
            np.array(Q), Q_ref, atol=1e-8, err_msg=str(cost_jax)
        )
        np.testing.assert_allclose(
            np.array(w), w_ref, atol=1e-7, err_msg=str(cost_jax)
        )


def test_l1ra_matches_scipy_oracle():
    prob = make_problem(n=25, extra_edges=40, noise_deg=3.0,
                        outlier_frac=0.15, seed=2)
    f = 1
    g, Q0 = _graph_from(prob, f=f)
    cfg = L1RAConfig(max_iters=5, change_th=1e-3)
    Q, iters, score = l1ra(g, cfg)
    A = ref_impl.make_A(prob["n"], f, prob["edges"])
    Q_ref, it_ref, score_ref = ref_impl.l1ra(
        prob["QQ"], prob["edges"], A, Q0, f, 5, 1e-3
    )
    assert int(iters) == it_ref
    np.testing.assert_allclose(np.array(Q), Q_ref, atol=1e-6)


def test_full_pipeline_outlier_robustness():
    prob = make_problem(n=50, extra_edges=120, noise_deg=1.5,
                        outlier_frac=0.25, seed=3)
    g, _ = _graph_from(prob)
    Q1, _, _ = l1ra(g, L1RAConfig(max_iters=5))
    g = dataclasses.replace(g, Q=Q1)
    Q2, w, iters, _ = irls(
        g, IRLSConfig(cost=Cost.GEMAN_MCCLURE, sigma=SIGMA, max_iters=100)
    )
    err = mean_geodesic_deg(np.array(so3.qnormalize(Q2)), prob["Q_gt"])
    assert err < 5.0, f"robust pipeline err {err} deg with 25% outliers"
    # non-robust L2 on the same problem must be much worse
    Q_l2, _, _, _ = irls(g, IRLSConfig(cost=Cost.L2, max_iters=100))
    err_l2 = mean_geodesic_deg(np.array(so3.qnormalize(Q_l2)), prob["Q_gt"])
    assert err < 0.5 * err_l2, f"robust {err} vs L2 {err_l2}"


def test_fixed_prefix_unchanged():
    prob = make_problem(n=30, extra_edges=40, seed=4)
    f = 5
    Q0 = np.zeros((prob["n"], 4))
    Q0[:, 3] = 1.0
    Q0[:f] = prob["Q_gt"][:f]
    g, Q_init = _graph_from(prob, f=f, Q0=Q0)
    Q, _, _, _ = irls(g, IRLSConfig(max_iters=30))
    np.testing.assert_array_equal(np.array(Q[:f]), Q_init[:f])
    Q, _, _ = l1ra(g, L1RAConfig(max_iters=3))
    np.testing.assert_array_equal(np.array(Q[:f]), Q_init[:f])


def test_padding_invariance():
    prob = make_problem(n=24, extra_edges=30, noise_deg=2.0, seed=5)
    g, _ = _graph_from(prob)
    gp = g.pad_to(g.m + 17, g.n + 9)
    cfg = IRLSConfig(max_iters=25, change_th=1e-6)
    Q_a, w_a, it_a, _ = irls(g, cfg)
    Q_b, w_b, it_b, _ = irls(gp, cfg)
    assert int(it_a) == int(it_b)
    np.testing.assert_allclose(np.array(Q_a), np.array(Q_b[: g.n]), atol=1e-10)
    np.testing.assert_allclose(np.array(w_a), np.array(w_b[: g.m]), atol=1e-10)

    cfgl = L1RAConfig(max_iters=3)
    Q_a, it_a, _ = l1ra(g, cfgl)
    Q_b, it_b, _ = l1ra(gp, cfgl)
    assert int(it_a) == int(it_b)
    np.testing.assert_allclose(np.array(Q_a), np.array(Q_b[: g.n]), atol=1e-8)


def test_cg_backend_matches_dense():
    prob = make_problem(n=40, extra_edges=60, noise_deg=2.0, seed=6)
    g, _ = _graph_from(prob)
    Qd, wd, itd, _ = irls(g, IRLSConfig(max_iters=20, backend="dense"))
    Qc, wc, itc, _ = irls(
        g, IRLSConfig(max_iters=20, backend="cg", cg_tol=1e-12, cg_maxiter=4000)
    )
    assert int(itd) == int(itc)
    np.testing.assert_allclose(np.array(Qd), np.array(Qc), atol=1e-7)


def test_disconnected_graph_raises():
    from irotavg_tpu.solver.init import DisconnectedGraphError

    Q = np.zeros((4, 4))
    Q[:, 3] = 1
    QQ = np.zeros((2, 4))
    QQ[:, 3] = 1
    edges = np.array([[0, 1], [2, 3]])
    with pytest.raises(DisconnectedGraphError):
        init_mst(Q, QQ, edges, 1)


def test_init_mst_matches_reference_semantics():
    # propagation must satisfy Q[j] = QQ_ij * Q[i] along tree edges when
    # relative rotations are exact
    prob = make_problem(n=20, extra_edges=10, noise_deg=0.0, seed=7)
    Q0 = np.zeros((prob["n"], 4))
    Q0[:, 3] = 1.0
    Q0[0] = prob["Q_gt"][0]
    Q = init_mst(Q0, prob["QQ"], prob["edges"], 1)
    err = mean_geodesic_deg(Q, prob["Q_gt"])
    assert err < 1e-8
