"""Adversarial solver robustness: singular Laplacians inside a window.

The reference aborts the process when its direct solver fails
(ral/l1_irls.cpp:149-177); its Talwar weight update can zero every weight
of a node (ral/l1_irls.cpp:674-727), making the IRLS normal equations
singular — the scipy oracle emits "Matrix is exactly singular" on such
problems.  Our policy (documented at solver/graph.py:laplacian_cho_solve):
never NaN, never abort — unconstrained directions get a (near) minimum-norm
zero update, i.e. those rotations simply keep their warm start, and
well-posed solves are untouched.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsc

from irotavg_tpu import so3
from irotavg_tpu.solver import RotationGraph
from irotavg_tpu.solver.irls import Cost, IRLSConfig, irls
from irotavg_tpu.solver.l1ra import L1RAConfig, l1ra
from synth import make_problem


def _geo_deg(Qa, Qb):
    d = np.abs(np.sum(np.asarray(Qa) * np.asarray(Qb), axis=-1))
    return np.degrees(2 * np.arccos(np.clip(d, -1, 1)))


def _outlier_island_problem(seed=0):
    """Chain of 12 + node 12 attached only through gross-outlier edges.

    Under Talwar every edge into node 12 gets weight 0 after the first
    iteration, so its Laplacian row/col vanish — an isolated free node.
    """
    prob = make_problem(n=12, extra_edges=8, noise_deg=1.0, seed=seed)
    rng = np.random.default_rng(seed + 1)
    edges = np.concatenate(
        [prob["edges"], np.array([[3, 12], [7, 12], [10, 12]], np.int32)]
    )
    QQ = np.concatenate(
        [prob["QQ"], Rsc.random(3, random_state=rng).as_quat()]
    )
    Q_gt = np.concatenate(
        [prob["Q_gt"], Rsc.random(1, random_state=rng).as_quat()]
    )
    return edges, QQ, Q_gt


@pytest.mark.parametrize("backend", ["dense", "cg"])
def test_talwar_all_outlier_node_stays_finite(backend):
    """Talwar zeroes all island-edge weights -> singular normal equations.

    IRLS restarts from unit weights (ral/l1_irls.cpp:577), so the product
    pipeline always runs the L1 phase first; even then Talwar at a tight
    sigma zeroes the island edges (and some dragged chain edges).  The
    policy under test: the singular solves never NaN or abort, in either
    backend.  (Accuracy under the product-default Geman-McClure cost is
    pinned separately below.)
    """
    edges, QQ, Q_gt = _outlier_island_problem()
    g = RotationGraph.create(edges, QQ, Q_gt.copy(), f=1, dtype=jnp.float64)
    Q1, _, _ = l1ra(g, L1RAConfig(max_iters=5, backend=backend))
    cfg = IRLSConfig(cost=Cost.TALWAR, sigma=np.radians(2.0),
                     max_iters=30, backend=backend)
    Q, w, iters, score = irls(dataclasses.replace(g, Q=Q1), cfg)
    Q = np.asarray(so3.qnormalize(Q))
    assert np.isfinite(Q).all(), "NaNs leaked out of a singular window"
    assert np.isfinite(np.asarray(w)).all()
    # island weights were driven to zero, making the Laplacian singular —
    # exactly the case the rescue shift exists for
    w = np.asarray(w)
    assert (w[-3:] == 0).all(), "island edges should be Talwar-zeroed"


@pytest.mark.parametrize("backend", ["dense", "cg"])
def test_outlier_island_gm_pipeline_recovers_chain(backend):
    """Product-default pipeline (L1 warmup -> Geman-McClure sigma=5deg) on
    the island problem: the chain stays near GT, island edges get tiny
    robust weights, and nothing NaNs."""
    edges, QQ, Q_gt = _outlier_island_problem()
    g = RotationGraph.create(edges, QQ, Q_gt.copy(), f=1, dtype=jnp.float64)
    Q1, _, _ = l1ra(g, L1RAConfig(max_iters=5, backend=backend))
    Q, w, iters, _ = irls(dataclasses.replace(g, Q=Q1),
                          IRLSConfig(max_iters=50, backend=backend))
    Q = np.asarray(so3.qnormalize(Q))
    assert np.isfinite(Q).all()
    # chain holds GT to ~the per-edge noise floor (1 deg noise)
    assert _geo_deg(Q[:12], Q_gt[:12]).max() < 4.0


@pytest.mark.parametrize("backend", ["dense", "cg"])
def test_disconnected_free_block_min_norm(backend):
    """A free component with intra-edges but no path to any fixed node.

    Gauge is undetermined for the block; policy: internal consistency is
    still optimised (CG's minimum-norm solution; dense path via the rescue
    shift), absolute gauge stays at the warm start, and nothing NaNs.
    """
    rng = np.random.default_rng(3)
    R = Rsc.random(8, random_state=rng)
    Q_gt = R.as_quat()
    # component A: nodes 0-3 (node 0 fixed); component B: nodes 4-7, free
    edges = np.array(
        [[0, 1], [1, 2], [2, 3], [0, 2], [4, 5], [5, 6], [6, 7], [4, 6]],
        np.int32,
    )
    QQ = (R[edges[:, 1]] * R[edges[:, 0]].inv()).as_quat()
    # warm start: identity everywhere except the fixed node
    Q0 = np.zeros((8, 4))
    Q0[:, 3] = 1.0
    Q0[0] = Q_gt[0]
    g = RotationGraph.create(edges, QQ, Q0, f=1, dtype=jnp.float64)
    Q, w, iters, score = irls(
        g, IRLSConfig(max_iters=60, backend=backend, change_th=1e-8)
    )
    Q = np.asarray(so3.qnormalize(Q))
    assert np.isfinite(Q).all()
    # component A converges to GT
    assert _geo_deg(Q[:4], Q_gt[:4]).max() < 1e-4
    # component B: relative rotations inside the block are satisfied
    res = so3.log_map(so3.delta_rel(edges[4:], jnp.asarray(QQ[4:]),
                                    jnp.asarray(Q)))
    assert np.degrees(np.abs(np.asarray(res)[:, 3])).max() < 1e-3


def test_l1ra_isolated_free_node_stays_finite():
    edges, QQ, Q_gt = _outlier_island_problem(seed=5)
    # degenerate variant: island edges all carry *zero-information*
    # duplicates of one random rotation, warm start far away
    Q0 = Q_gt.copy()
    g = RotationGraph.create(edges, QQ, Q0, f=1, dtype=jnp.float64)
    Q, iters, score = l1ra(g, L1RAConfig(max_iters=5))
    assert np.isfinite(np.asarray(Q)).all()


@pytest.mark.parametrize("backend", ["dense", "cg"])
def test_well_posed_solve_unchanged_by_rescue(backend):
    """The rescue path must not perturb healthy problems: the dense result
    must agree with the (rescue-free) scipy oracle to solver precision."""
    import ref_impl

    prob = make_problem(n=30, extra_edges=40, noise_deg=2.0,
                        outlier_frac=0.15, seed=7)
    Q0 = prob["Q_gt"].copy()
    g = RotationGraph.create(prob["edges"], prob["QQ"], Q0, f=1,
                             dtype=jnp.float64)
    cfg = IRLSConfig(max_iters=50, backend=backend)
    Q, w, iters, _ = irls(g, cfg)
    A = ref_impl.make_A(prob["n"], 1, prob["edges"])
    Q_ref, _, it_ref, _ = ref_impl.irls(
        prob["QQ"], prob["edges"], A, "Geman-McClure", cfg.sigma,
        Q0.copy(), 1, 50, cfg.change_th,
    )
    assert np.isfinite(Q_ref).all()  # oracle itself must be healthy here
    assert int(iters) == it_ref
    atol = 1e-7 if backend == "dense" else 5e-5
    np.testing.assert_allclose(np.asarray(Q), Q_ref, atol=atol)
