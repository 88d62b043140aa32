"""SIFT front-end + matcher tests (the reference's USE_ORB=0 path,
src/Frame.cpp:64-99, and findSIFTMatches, src/ViewGraph.cpp:694-722)."""

import numpy as np
import pytest

from seqgen import make_sequence
from irotavg_tpu.frontend.sift import SIFTExtractor
from irotavg_tpu.matching.matchers import match_sift, matches_to_pairs


@pytest.fixture(scope="module")
def pair():
    frames, K, R_gt = make_sequence(n_frames=2, seed=5, step=0.25,
                                    yaw_deg_per_frame=-0.8)
    ext = SIFTExtractor(n_features=600)
    return [ext(f) for f in frames], frames


def test_extractor_shapes_and_mask(pair):
    outs, _ = pair
    o = outs[0]
    n = o["x0"].shape[0]
    assert o["desc"].shape == (n, 128)
    v = np.asarray(o["valid"])
    assert v.sum() > 100, f"only {v.sum()} SIFT keypoints detected"
    # descriptors are L2-normalised (after clamping, norm stays ~1)
    nrm = np.linalg.norm(np.asarray(o["desc"])[v], axis=1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-3)


def test_keypoints_inside_image(pair):
    outs, frames = pair
    h, w = frames[0].shape
    o = outs[0]
    v = np.asarray(o["valid"])
    assert (np.asarray(o["x0"])[v] < w).all()
    assert (np.asarray(o["y0"])[v] < h).all()
    assert (np.asarray(o["response"])[v] > 0).all()


def test_match_sift_finds_consistent_motion(pair):
    outs, _ = pair

    class F:
        pass

    fs = []
    for o in outs:
        f = F()
        f.desc = np.asarray(o["desc"])
        f.valid = np.asarray(o["valid"])
        f.x = np.asarray(o["x0"])
        f.y = np.asarray(o["y0"])
        fs.append(f)
    m12 = np.asarray(match_sift(fs[0], fs[1]))
    pairs = matches_to_pairs(m12)
    assert len(pairs) > 40, f"only {len(pairs)} SIFT matches"
    dx = fs[1].x[pairs[:, 1]] - fs[0].x[pairs[:, 0]]
    dy = fs[1].y[pairs[:, 1]] - fs[0].y[pairs[:, 0]]
    # dominant image motion is horizontal and consistent; the median
    # displacement should describe most matches
    mx, my = np.median(dx), np.median(dy)
    inl = (np.abs(dx - mx) < 8) & (np.abs(dy - my) < 8)
    assert inl.mean() > 0.6, f"inlier ratio {inl.mean():.2f}"
    assert abs(mx) > 1.0


def test_descriptor_rotation_covariance():
    """The same structure rotated 90 deg matches itself (steering works)."""
    rng = np.random.default_rng(7)
    im = rng.integers(0, 255, (160, 160), np.uint8)
    import scipy.ndimage as ndi

    im = ndi.gaussian_filter(im.astype(np.float32), 2.0)
    im = (255 * (im - im.min()) / (np.ptp(im) + 1e-9)).astype(np.uint8)
    im90 = np.rot90(im).copy()
    ext = SIFTExtractor(n_features=200, n_octaves=2)
    o1, o2 = ext(im), ext(im90)

    class F:
        pass

    f1, f2 = F(), F()
    f1.desc, f1.valid = np.asarray(o1["desc"]), np.asarray(o1["valid"])
    f2.desc, f2.valid = np.asarray(o2["desc"]), np.asarray(o2["valid"])
    m12 = np.asarray(match_sift(f1, f2))
    pairs = matches_to_pairs(m12)
    assert len(pairs) >= 10
    # rot90 maps (x, y) -> (y, W-1-x)
    x1 = np.asarray(o1["x0"])[pairs[:, 0]]
    y1 = np.asarray(o1["y0"])[pairs[:, 0]]
    x2 = np.asarray(o2["x0"])[pairs[:, 1]]
    y2 = np.asarray(o2["y0"])[pairs[:, 1]]
    pred_x2, pred_y2 = y1, im.shape[1] - 1 - x1
    err = np.hypot(pred_x2 - x2, pred_y2 - y2)
    assert np.median(err) < 3.0, f"median geometric error {np.median(err)}"


def test_frame_accepts_sift_extractor():
    """Frame's ctor pipeline is extractor-agnostic (the reference's
    USE_ORB switch lives inside Frame::findFeatures)."""
    from irotavg_tpu.frontend import Camera, Frame

    frames, K, _ = make_sequence(n_frames=1, seed=3)
    cam = Camera(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
                 width=640, height=480)
    ext = SIFTExtractor(n_features=300, n_octaves=3)
    f = Frame(0, frames[0], ext, cam)
    assert f.desc.shape[1] == 128
    assert f.n_valid > 50
    assert f.cell.shape == (len(f.valid), 2)
