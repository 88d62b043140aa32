"""Real-imagery code paths: photometric noise + lens distortion.

The bench sequences now carry sensor noise, optical blur, and radial
distortion (k1 != 0), which exercises (a) the Camera's iterative
undistortion consumed by Frame/offline keypoint handling — the
`undistortKeypoints` path (src/Frame.cpp:102-139) that a clean pinhole
render never runs — and (b) the FAST two-threshold fallback in
low-contrast cells (src/ORBExtractor.cpp:833-842).
"""

import numpy as np
import pytest

from seqgen import _distortion_maps, make_sequence
from irotavg_tpu.frontend.camera import Camera

NOISE = dict(noise_sigma=5.0, blur_sigma=0.6, k1=-0.28, k2=0.07)


def test_seqgen_lens_model_matches_runtime_camera():
    """seqgen's forward distortion and Camera.undistort_points must be
    inverses: the runtime undistortion of a distorted pixel recovers the
    ideal pinhole position seqgen sampled from."""
    K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]])
    mx, my = _distortion_maps(K, NOISE["k1"], NOISE["k2"], (640, 480))
    cam = Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                 k1=NOISE["k1"], k2=NOISE["k2"], width=640, height=480)
    rng = np.random.default_rng(0)
    u = rng.integers(40, 600, 200)
    v = rng.integers(40, 440, 200)
    xu, yu = cam.undistort_points(u.astype(float), v.astype(float))
    np.testing.assert_allclose(xu, mx[v, u], atol=0.15)
    np.testing.assert_allclose(yu, my[v, u], atol=0.15)


def test_noisy_sequence_changes_pixels_but_keeps_gt():
    clean, K1, R1 = make_sequence(n_frames=3, seed=9)
    noisy, K2, R2 = make_sequence(n_frames=3, seed=9, **NOISE)
    np.testing.assert_array_equal(R1, R2)
    assert np.abs(clean[0].astype(int) - noisy[0].astype(int)).mean() > 2.0


def test_fast_two_threshold_fallback_contributes_on_noisy_frames():
    """The FAST low-threshold fallback (cells where no corner clears the
    high threshold retry at min_th, src/ORBExtractor.cpp:833-842) must
    actually fire on the bench imagery: running the same extractor with
    the fallback disabled (th_lo == th_hi) must find fewer keypoints."""
    from seqgen import make_ring_sequence
    from irotavg_tpu.frontend.orb import ORBExtractor

    frames, K, _ = make_ring_sequence(n_frames=1, seed=3, laps=0.01,
                                      **NOISE)
    ext = ORBExtractor(n_features=1000, n_levels=8)
    with_fb = ext(frames[0])
    n_with = int(np.asarray(with_fb["valid"]).sum())
    ext2 = ORBExtractor(n_features=1000, n_levels=8,
                        ini_th_fast=20, min_th_fast=20)
    n_without = int(np.asarray(ext2(frames[0])["valid"]).sum())
    assert n_with > n_without, (
        f"fallback contributed nothing: {n_with} vs {n_without}")


def test_prefetch_inprogram_undistortion_matches_host():
    """The batched extractor's in-program undistortion (one device
    program, no per-frame transfers) agrees with the host Camera math."""
    from irotavg_tpu.frontend.orb import ORBExtractor
    from irotavg_tpu.frontend.prefetch import FramePrefetcher

    frames, K, _ = make_sequence(n_frames=2, seed=1, **NOISE)
    cam = Camera(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                 width=640, height=480, k1=NOISE["k1"], k2=NOISE["k2"])
    ext = ORBExtractor(n_features=500, n_levels=8)
    f = FramePrefetcher(frames, ext, cam, batch=2).frame(0)
    v = f.valid
    assert v.sum() > 50
    xu_host, yu_host = cam.undistort_points(f.x, f.y)
    np.testing.assert_allclose(f.xu[v], xu_host[v], atol=0.05)
    np.testing.assert_allclose(f.yu[v], yu_host[v], atol=0.05)


@pytest.mark.slow
def test_offline_accuracy_on_noisy_distorted_sequence():
    """The pipeline holds accuracy through noise + k1 != 0 undistortion:
    per-edge relative-rotation error stays well under the clean-world
    solver tolerance, and the trajectory RMSE stays sub-degree."""
    from scipy.spatial.transform import Rotation as Rsc
    from irotavg_tpu.frontend.orb import ORBExtractor
    from irotavg_tpu.pipeline.offline import run_offline

    frames, K, R_gt = make_sequence(n_frames=14, seed=3, loop=False,
                                    **NOISE)
    cam = Camera(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                 width=640, height=480, k1=NOISE["k1"], k2=NOISE["k2"])
    assert cam.has_distortion
    ext = ORBExtractor(n_features=1000, n_levels=8)
    res = run_offline(frames, cam, ext, vocab=None, batch=4, chunk=4,
                      min_matches=40)

    kfs = np.asarray(res.keyframes)
    assert len(kfs) >= 4
    Rg = np.array(R_gt)
    R_rel_gt = Rg[kfs[res.edges[:, 1]]] @ np.swapaxes(
        Rg[kfs[res.edges[:, 0]]], 1, 2)
    q_rel_gt = Rsc.from_matrix(R_rel_gt).as_quat()
    d = np.abs(np.sum(np.array(res.QQ) * q_rel_gt, axis=-1))
    edge_err = np.degrees(2 * np.arccos(np.clip(d, -1, 1)))
    assert edge_err.mean() < 0.5

    Rs = Rsc.from_quat(np.array(res.Q))
    gt = Rsc.from_matrix(Rg[kfs])
    rel = (Rs[0].inv() * Rs).inv() * (gt[0].inv() * gt)
    err = rel.magnitude() * 180.0 / np.pi
    assert float(np.sqrt((err ** 2).mean())) < 0.6
