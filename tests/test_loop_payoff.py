"""Loop-closure accuracy payoff on the one-way ring workload.

The signature capability of the reference (loop-closure block,
src/IRotAvg.cpp:295-353): on a trajectory whose odometry drift
accumulates monotonically (two one-way laps of the ring world —
reversing trajectories cancel their own drift and show no payoff),
verified loop edges must cut the trajectory RMSE by at least 2x.
Measured at this config on CPU: ~9.6 deg without vs ~2.0 deg with
(33 loop edges) — a 4.7x margin over the asserted bound.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsc

from seqgen import make_ring_sequence
from irotavg_tpu.frontend.camera import Camera
from irotavg_tpu.frontend.orb import ORBExtractor
from irotavg_tpu.pipeline.offline import run_offline

NOISE = dict(noise_sigma=6.0, blur_sigma=0.6, k1=-0.28, k2=0.07)


@pytest.mark.slow
def test_loop_closure_halves_ring_drift():
    frames, K, R_gt = make_ring_sequence(n_frames=120, seed=7, laps=2.0,
                                         **NOISE)
    cam = Camera(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                 width=640, height=480, k1=NOISE["k1"], k2=NOISE["k2"])
    ext = ORBExtractor(n_features=1000, n_levels=8)

    import bench

    vocab = bench.product_vocab(allow_build=False)
    if vocab is None:
        pytest.skip("product vocabulary fixture not available")

    def rmse(r):
        Rs = Rsc.from_quat(np.array(r.Q))
        gt = Rsc.from_matrix(np.array(R_gt[r.keyframes]))
        rel = (Rs[0].inv() * Rs).inv() * (gt[0].inv() * gt)
        err = rel.magnitude() * 180.0 / np.pi
        return float(np.sqrt((err ** 2).mean()))

    res_nl = run_offline(frames, cam, ext, vocab=None, batch=8, chunk=8,
                         min_matches=40)
    res = run_offline(frames, cam, ext, vocab=vocab, batch=8, chunk=8,
                      min_matches=40)
    r_nl, r_l = rmse(res_nl), rmse(res)
    assert res.loop_edges > 0, "no verified loop edges on a revisit lap"
    assert r_l * 2.0 < r_nl, (
        f"loop closure payoff below 2x: {r_l:.3f} vs {r_nl:.3f} deg "
        f"({res.loop_edges} loop edges)"
    )
