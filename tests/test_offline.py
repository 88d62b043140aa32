"""Offline batched pipeline: accuracy vs ground truth + CLI round trip."""

import numpy as np
import pytest

from seqgen import make_sequence
from irotavg_tpu import so3
from irotavg_tpu.frontend import Camera, ORBExtractor
from irotavg_tpu.pipeline import run_offline


@pytest.fixture(scope="module")
def offline_run():
    frames, K, R_gt = make_sequence(n_frames=12, seed=1, step=0.3,
                                    yaw_deg_per_frame=-1.0)
    cam = Camera(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                 width=640, height=480)
    ext = ORBExtractor(n_features=1200, n_levels=8)
    res = run_offline(frames, cam, ext, batch=4, chunk=8,
                      min_matches=60, win_size=4)
    return res, R_gt


def test_offline_selects_keyframes_and_edges(offline_run):
    res, _ = offline_run
    assert len(res.keyframes) >= 10
    # window density: roughly win_size edges per keyframe
    assert len(res.edges) >= 2 * (len(res.keyframes) - 2)
    assert (res.n_matches >= 60).all()


def test_offline_rotations_match_ground_truth(offline_run):
    res, R_gt = offline_run
    q_gt = np.stack([np.asarray(so3.rotmat_to_quat(R_gt[i]))
                     for i in res.keyframes])
    qa = so3.qmul(res.Q, np.tile(so3.qinv_flipw(res.Q[0]), (len(res.Q), 1)))
    qb = so3.qmul(q_gt, np.tile(so3.qinv_flipw(q_gt[0]), (len(q_gt), 1)))
    err = np.degrees(np.asarray(so3.qgeodesic(so3.qnormalize(qa), qb)))
    assert err.mean() < 1.0, f"mean rotation error {err.mean():.2f} deg"
    assert err.max() < 2.5, f"max rotation error {err.max():.2f} deg"


def test_offline_matches_incremental_engine(offline_run):
    """Offline and incremental paths agree on the same sequence."""
    res, R_gt = offline_run
    from irotavg_tpu.engine.viewgraph import ViewGraph
    from irotavg_tpu.frontend import Frame

    frames, K, _ = make_sequence(n_frames=12, seed=1, step=0.3,
                                 yaw_deg_per_frame=-1.0)
    cam = Camera(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                 width=640, height=480)
    ext = ORBExtractor(n_features=1200, n_levels=8)
    vg = ViewGraph(cam, min_matches=60)
    kept = []
    for i, im in enumerate(frames):
        if vg.process_frame(Frame(i, im, ext, cam), win_size=4):
            kept.append(i)
            vg.rot_avg(10)
    common = sorted(set(kept) & set(res.keyframes))
    assert len(common) >= 8
    qi = np.stack([vg.ra.Q[kept.index(i)] for i in common])
    qo = np.stack([res.Q[res.keyframes.index(i)] for i in common])
    qa = so3.qmul(qi, np.tile(so3.qinv_flipw(qi[0]), (len(qi), 1)))
    qb = so3.qmul(qo, np.tile(so3.qinv_flipw(qo[0]), (len(qo), 1)))
    err = np.degrees(np.asarray(so3.qgeodesic(
        so3.qnormalize(qa), so3.qnormalize(qb))))
    assert err.mean() < 1.0, f"incremental/offline divergence {err.mean():.2f}"


def test_offline_loop_closure_adds_edges():
    frames, K, R_gt = make_sequence(n_frames=14, seed=4, step=0.3,
                                    yaw_deg_per_frame=-1.2, loop=True)
    cam = Camera(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                 width=640, height=480)
    ext = ORBExtractor(n_features=1000, n_levels=8)
    from irotavg_tpu.placerec import train_vocabulary
    import dataclasses

    sample = []
    for im in frames[::4]:
        out = ext(im)
        import jax
        o = jax.device_get(out)
        sample.append(o["desc"][o["valid"]][:300])
    vocab = train_vocabulary(sample, k=8, L=3, seed=0)
    from irotavg_tpu.config import LoopClosureConfig, PipelineConfig

    cfg = PipelineConfig(loop=LoopClosureConfig(
        covisibility_consistency_th=1, min_matches=60))
    res = run_offline(frames, cam, ext, vocab=vocab, cfg=cfg, batch=4,
                      chunk=8, min_matches=60, win_size=4)
    assert res.loop_edges >= 1, "no loop edges on the out-and-back sequence"
    spans = res.edges[:, 1] - res.edges[:, 0]
    assert spans.max() > 4


def test_batch_cli_end_to_end(tmp_path):
    from PIL import Image

    frames, K, _ = make_sequence(n_frames=8, seed=2, step=0.3,
                                 yaw_deg_per_frame=-1.0)
    seq = tmp_path / "seq"
    seq.mkdir()
    for i, im in enumerate(frames):
        Image.fromarray(im).save(seq / f"{i:06d}.png")
    yaml = tmp_path / "cam.yaml"
    yaml.write_text(
        "%YAML:1.0\n"
        f"Camera.fx: {K[0, 0]}\nCamera.fy: {K[1, 1]}\n"
        f"Camera.cx: {K[0, 2]}\nCamera.cy: {K[1, 2]}\n"
        "Camera.k1: 0.0\nCamera.k2: 0.0\nCamera.p1: 0.0\nCamera.p2: 0.0\n"
        "ORBextractor.nFeatures: 1000\nORBextractor.scaleFactor: 1.2\n"
        "ORBextractor.nLevels: 8\nORBextractor.iniThFAST: 20\n"
        "ORBextractor.minThFAST: 7\n"
    )
    from irotavg_tpu.app.irotavg_batch import main

    out = tmp_path / "out"
    rc = main(["none", str(yaml), str(seq), "--out_dir", str(out),
               "--batch", "4", "--chunk", "8"])
    assert rc == 0
    poses = np.loadtxt(out / "rotavg_poses.txt")
    assert poses.shape[1] == 8
    # unit quaternions, zero translations
    np.testing.assert_allclose(
        np.linalg.norm(poses[:, 1:5], axis=1), 1.0, atol=1e-6)
    assert (poses[:, 5:] == 0).all()
    ids = np.loadtxt(out / "rotavg_poses_ids.txt")
    assert len(ids) == len(poses)
