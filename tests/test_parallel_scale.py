"""BASELINE config-5 stand-in: a 50k-view solve on the 8-device mesh.

The reference cannot express this problem at all (single-threaded
SuiteSparse, ral/l1_irls.cpp:536-556); SURVEY §7 step 7 calls for the
distributed layer to absorb it.  Checks, on the virtual 8-device CPU mesh:

* the full distributed pipeline (L1 warmup -> Geman-McClure IRLS) runs a
  50k-view / ~250k-edge problem end to end without materialising anything
  O(n^2) and stays finite;
* its result agrees with the single-device matrix-free solver on the same
  schedule (the distributed step is the same masked math — only summation
  order differs);
* `init_multihost` is a safe no-op in a single-process run.
"""

import dataclasses
import time

import jax.numpy as jnp
import numpy as np
import pytest

from synth import make_problem
from irotavg_tpu import so3
from irotavg_tpu.solver import RotationGraph
from irotavg_tpu.solver.irls import Cost, IRLSConfig, irls
from irotavg_tpu.parallel import (
    init_multihost,
    make_graph_mesh,
    shard_graph,
    sharded_ravg_pipeline,
)

N = 50_000
M_EXTRA = 200_000


@pytest.fixture(scope="module")
def big_problem():
    """Quasi-global re-solve contract: warm start near the solution.

    The product path only reaches n=50k through `rotAvg(5e6)` after a loop
    closure (src/IRotAvg.cpp:371-378), where the incremental state is
    already near-optimal — a *cold* MST init over a 50k chain accumulates
    random-walk drift (~noise*sqrt(n) ≈ hundreds of degrees) and is not
    this path's job.  Model the warm start as GT ⊕ 3° perturbation.
    """
    from scipy.spatial.transform import Rotation as Rsc

    p = make_problem(n=N, extra_edges=M_EXTRA, noise_deg=3.0,
                     outlier_frac=0.1, seed=11)
    rng = np.random.default_rng(12)
    perturb = Rsc.from_rotvec(rng.normal(scale=np.radians(3.0), size=(N, 3)))
    Q0 = (perturb * Rsc.from_quat(p["Q_gt"])).as_quat()
    Q0[0] = p["Q_gt"][0]
    g = RotationGraph.create(p["edges"], p["QQ"], Q0, f=1,
                             dtype=jnp.float32)
    m_pad = -(-g.m // 8) * 8
    return p, g.pad_to(m_pad, g.n)


def test_sharded_50k_pipeline(big_problem):
    p, g = big_problem
    cfg = IRLSConfig(max_iters=12, change_th=1e-4, backend="cg",
                     cg_tol=1e-5, cg_maxiter=100)

    mesh = make_graph_mesh(8)
    gs = shard_graph(g, mesh)
    solve = sharded_ravg_pipeline(mesh, l1_iters=2, cfg=cfg)
    t0 = time.perf_counter()
    Q_sh, w_sh, iters, score = solve(gs)
    Q_sh.block_until_ready()
    wall = time.perf_counter() - t0
    print(f"\n50k-view sharded solve: {wall:.1f}s "
          f"({int(iters)} iters, score {float(score):.2e})")

    Q_sh = np.asarray(so3.qnormalize(Q_sh))
    assert np.isfinite(Q_sh).all()
    assert int(iters) >= 4, "the loop should genuinely iterate at 50k"

    # single-device reference on the identical two-phase schedule
    Q1, _, _, _ = irls(g, dataclasses.replace(cfg, cost=Cost.L1,
                                              max_iters=2))
    Q_ref, _, it_ref, _ = irls(dataclasses.replace(g, Q=Q1), cfg)
    Q_ref = np.asarray(so3.qnormalize(Q_ref))

    gdeg = np.degrees(2 * np.arccos(np.clip(
        np.abs(np.sum(Q_sh * Q_ref, axis=-1)), -1, 1)))
    # f32 + CG tolerance + different accumulation order over 250k edges
    assert gdeg.max() < 0.2, f"max divergence {gdeg.max():.4f} deg"
    assert gdeg.mean() < 0.02, f"mean divergence {gdeg.mean():.5f} deg"

    # accuracy: better than the perturbed warm start and near the problem's
    # GM fixed point (~3.7 deg for this noise model: 3 deg/axis rotvec noise
    # is ~5.2 deg total edge noise, plus 10% outlier bias at sigma=5 deg —
    # the same value a float64 solve starting exactly at GT settles to)
    gt32 = p["Q_gt"].astype(np.float32)
    err = np.degrees(2 * np.arccos(np.clip(
        np.abs(np.sum(Q_sh * gt32, axis=-1)), -1, 1)))
    Q0 = np.asarray(g.Q)[:N]
    err0 = np.degrees(2 * np.arccos(np.clip(
        np.abs(np.sum(Q0 * gt32, axis=-1)), -1, 1)))
    assert err.mean() < err0.mean(), (
        f"mean error vs GT {err.mean():.2f} deg (start {err0.mean():.2f})"
    )
    assert err.mean() < 4.5, f"mean error vs GT {err.mean():.2f} deg"


def test_init_multihost_noop_single_process():
    pid, nproc = init_multihost()
    assert (pid, nproc) == (0, 1)
