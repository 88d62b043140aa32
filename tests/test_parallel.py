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
