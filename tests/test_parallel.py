"""Distributed (edge-sharded) IRLS must match the single-device solver."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synth import make_problem
from irotavg_tpu import so3
from irotavg_tpu.solver import RotationGraph, init_mst, irls
from irotavg_tpu.solver.irls import Cost, IRLSConfig
from irotavg_tpu.parallel import (
    make_graph_mesh,
    shard_graph,
    sharded_irls,
    sharded_irls_step,
)


def _graph(n=50, extra=80, outlier_frac=0.1, seed=7, m_pad=256):
    p = make_problem(n=n, extra_edges=extra, noise_deg=1.5,
                     outlier_frac=outlier_frac, seed=seed)
    Q0 = init_mst(np.tile([0.0, 0, 0, 1], (n, 1)), p["QQ"], p["edges"], 1)
    g = RotationGraph.create(p["edges"], p["QQ"], Q0, f=1, dtype=np.float64)
    return g.pad_to(m_pad, n)


@pytest.mark.parametrize("cost", [Cost.GEMAN_MCCLURE, Cost.CAUCHY])
def test_sharded_irls_matches_single_device(cost):
    g = _graph()
    cfg = IRLSConfig(cost=cost, backend="cg", cg_tol=1e-12, cg_maxiter=2000)

    Q_ref, w_ref, it_ref, _ = irls(g, cfg)

    mesh = make_graph_mesh(8)
    gs = shard_graph(g, mesh)
    solve = sharded_irls(mesh, cfg)
    Q_sh, w_sh, it_sh, _ = solve(gs)

    err = np.degrees(
        np.asarray(so3.qgeodesic(so3.qnormalize(Q_ref), so3.qnormalize(Q_sh)))
    )
    assert err.max() < 1e-6
    assert int(it_ref) == int(it_sh)
    np.testing.assert_allclose(np.asarray(w_ref), np.asarray(w_sh), rtol=1e-8)


def test_sharded_step_is_jittable_and_deterministic():
    g = _graph(seed=11)
    mesh = make_graph_mesh(8)
    gs = shard_graph(g, mesh)
    cfg = IRLSConfig(backend="cg")
    step = sharded_irls_step(mesh, cfg)
    w0 = jnp.ones((gs.m,), gs.dtype)
    Q1, w1, s1 = step(gs, w0)
    Q2, w2, s2 = step(gs, w0)
    np.testing.assert_array_equal(np.asarray(Q1), np.asarray(Q2))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_shard_graph_rejects_indivisible():
    g = _graph(m_pad=250)  # 250 % 8 != 0
    mesh = make_graph_mesh(8)
    with pytest.raises(ValueError):
        shard_graph(g, mesh)


def test_sharded_pipeline_rejects_outliers():
    """Full distributed pipeline (L1 warmup -> robust IRLS) recovers the
    ground truth on an outlier-contaminated graph."""
    from irotavg_tpu.parallel import sharded_ravg_pipeline

    p = make_problem(n=60, extra_edges=90, noise_deg=1.0,
                     outlier_frac=0.2, seed=3)
    Q0 = init_mst(np.tile([0.0, 0, 0, 1], (60, 1)), p["QQ"], p["edges"], 1)
    g = RotationGraph.create(p["edges"], p["QQ"], Q0, f=1,
                             dtype=np.float64).pad_to(256, 60)

    mesh = make_graph_mesh(8)
    gs = shard_graph(g, mesh)
    cfg = IRLSConfig(cost=Cost.GEMAN_MCCLURE, backend="cg",
                     cg_tol=1e-12, cg_maxiter=2000, max_iters=50)
    solve = sharded_ravg_pipeline(mesh, l1_iters=5, cfg=cfg)
    Q, w, iters, score = solve(gs)

    # parity: must land where the canonical single-device pipeline lands
    from irotavg_tpu.solver import l1ra as _l1ra
    from irotavg_tpu.solver.l1ra import L1RAConfig

    Q1, _, _ = _l1ra(g, L1RAConfig(max_iters=5, change_th=1e-3))
    Q2, w_ref, _, _ = irls(dataclasses.replace(g, Q=Q1), cfg)
    err = np.degrees(np.asarray(so3.qgeodesic(
        so3.qnormalize(Q), so3.qnormalize(Q2)
    )))[:60]
    assert err.max() < 0.05, f"max divergence {err.max():.4f} deg"

    # the heavy outliers (planted at >> noise level) get down-weighted:
    # flag edges whose ground-truth residual exceeds 5x the noise
    d = so3.qgeodesic(
        so3.qmul(np.asarray(p["Q_gt"])[p["edges"][:, 1]] * [-1, -1, -1, 1],
                 so3.qmul(p["QQ"], np.asarray(p["Q_gt"])[p["edges"][:, 0]])),
        np.array([0.0, 0, 0, 1]),
    )
    out_mask = np.degrees(np.asarray(d)) > 5.0
    w = np.asarray(w)[:len(out_mask)]
    assert out_mask.any()
    assert w[out_mask].mean() < 0.5 * w[~out_mask].mean()
