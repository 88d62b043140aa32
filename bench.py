"""Benchmark: batch robust rotation averaging on the reference workload.

Runs the full batch pipeline (init_mst -> L1-RA -> IRLS, reference defaults:
5 L1 iters, 50 IRLS iters, Geman-McClure sigma=5deg, th=1e-3 — see
BASELINE.md) on the bundled real problem `ral/data/ravg_input.txt`
(m=3655 edges, n=1832 views) and prints one JSON line.

Baseline: the C++ reference cannot be built in this image (no
Eigen/SuiteSparse headers), so the baseline is the in-repo scipy oracle
(tests/ref_impl.py) — the same algorithm over CPU sparse direct solves,
i.e. the closest measurable stand-in for the reference's SuiteSparse path.
vs_baseline = oracle_ms / tpu_ms (higher is better).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

PROBLEM = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "tests", "data", "ravg_input.txt.gz",
)
REPS = 5


def load_problem():
    from irotavg_tpu.solver import read_problem
    from irotavg_tpu.solver.init import init_mst

    if os.path.exists(PROBLEM):
        prob = read_problem(PROBLEM)
    else:  # fallback: synthetic problem of the same size
        from synth import make_problem

        p = make_problem(n=1832, extra_edges=3655 - 1831, noise_deg=2.0,
                         outlier_frac=0.1, seed=0)
        prob = {"edges": p["edges"], "QQ": p["QQ"],
                "Q": np.zeros((1832, 4)), "f": 0}
    f = max(prob["f"], 1)
    if prob["f"] == 0:
        prob["Q"][0] = [0, 0, 0, 1]
    Q0 = init_mst(prob["Q"], prob["QQ"], prob["edges"], f)
    return prob["edges"], prob["QQ"], Q0, f


def main():
    import jax

    edges, QQ, Q0, f = load_problem()

    # --- baseline: scipy sparse direct-solve oracle on host CPU ---------
    import ref_impl as oracle

    A = oracle.make_A(len(Q0), f, edges)
    t0 = time.perf_counter()
    Q_b, _, _ = oracle.l1ra(QQ, edges, A, Q0.copy(), f,
                            max_iters=5, change_th=1e-3)
    Q_b, w_b, _, _ = oracle.irls(QQ, edges, A, "Geman-McClure",
                                 np.deg2rad(5.0), Q_b, f,
                                 max_iters=50, change_th=1e-3)
    baseline_ms = (time.perf_counter() - t0) * 1e3

    # --- ours: jitted pipeline (f32 on the accelerator) -----------------
    import dataclasses

    import jax.numpy as jnp
    from irotavg_tpu import so3
    from irotavg_tpu.solver import RotationGraph, l1ra, irls
    from irotavg_tpu.solver.l1ra import L1RAConfig
    from irotavg_tpu.solver.irls import IRLSConfig

    g = RotationGraph.create(edges, QQ, Q0, f=f, dtype=jnp.float32)
    l1_cfg = L1RAConfig(max_iters=5, change_th=1e-3)
    irls_cfg = IRLSConfig(max_iters=50, change_th=1e-3, backend="dense")

    @jax.jit
    def pipeline(g):
        Q1, _, _ = l1ra(g, l1_cfg)
        Q2, w, _, _ = irls(dataclasses.replace(g, Q=Q1), irls_cfg)
        return so3.qnormalize(Q2), w

    Qf, w = pipeline(g)  # compile + warmup
    Qf.block_until_ready()

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        Qf, w = pipeline(g)
        Qf.block_until_ready()
        times.append((time.perf_counter() - t0) * 1e3)
    ours_ms = float(np.median(times))

    # sanity: solution quality must match the oracle's
    res = so3.log_map(so3.delta_rel(g.edges, g.QQ, Qf))[:, 3]
    mean_res_deg = float(np.degrees(np.abs(np.asarray(res))).mean())
    res_b = so3.log_map(so3.delta_rel(edges, QQ, jnp.asarray(Q_b)))[:, 3]
    oracle_res_deg = float(np.degrees(np.abs(np.asarray(res_b))).mean())
    ok = mean_res_deg < max(2.0 * oracle_res_deg, 0.1)

    print(json.dumps({
        "metric": "batch_ravg_solve_ms_m3655_n1832",
        "value": round(ours_ms, 2),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / ours_ms, 3),
        "baseline_ms": round(baseline_ms, 1),
        "mean_residual_deg": round(mean_res_deg, 4),
        "oracle_residual_deg": round(oracle_res_deg, 4),
        "quality_ok": bool(ok),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
