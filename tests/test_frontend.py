"""Front-end kernels vs OpenCV oracles (cv2 is the lineage of the
reference's vendored ORB code, so it doubles as ground truth)."""

import cv2
import numpy as np
import pytest

from irotavg_tpu.ops.fast import fast_score_map, nms3
from irotavg_tpu.ops.image import gaussian_blur7, resize_bilinear
from irotavg_tpu.ops.hamming import hamming_matrix
from irotavg_tpu.ops.orient import orb_disc_mask
from irotavg_tpu.frontend import Camera, ORBExtractor


@pytest.fixture(scope="module")
def img():
    """Deterministic synthetic scene with corners and texture."""
    rng = np.random.default_rng(42)
    im = np.full((240, 320), 128, np.uint8)
    for _ in range(40):  # random rectangles
        x, y = rng.integers(10, 300), rng.integers(10, 220)
        w, h = rng.integers(8, 40), rng.integers(8, 40)
        v = int(rng.integers(0, 255))
        cv2.rectangle(im, (int(x), int(y)), (int(x + w), int(y + h)), v, -1)
    for _ in range(30):  # circles
        c = (int(rng.integers(20, 300)), int(rng.integers(20, 220)))
        cv2.circle(im, c, int(rng.integers(3, 15)), int(rng.integers(0, 255)), -1)
    noise = rng.normal(0, 3, im.shape)
    return np.clip(im.astype(np.float64) + noise, 0, 255).astype(np.uint8)


def test_fast_corners_match_cv2(img):
    t = 20
    score = np.asarray(fast_score_map(np.float32(img)))
    ours = score >= t

    det = cv2.FastFeatureDetector_create(
        threshold=t, nonmaxSuppression=False,
        type=cv2.FastFeatureDetector_TYPE_9_16,
    )
    kps = det.detect(img)
    cv_mask = np.zeros(img.shape, bool)
    for k in kps:
        cv_mask[int(round(k.pt[1])), int(round(k.pt[0]))] = True

    # compare away from the image frame (cv2 has its own 3px border rule)
    inner = np.zeros(img.shape, bool)
    inner[4:-4, 4:-4] = True
    agree = (ours == cv_mask)[inner]
    assert agree.mean() > 0.999, f"FAST mask agreement {agree.mean():.4f}"
    # and the actual corner sets overlap almost perfectly
    both = (ours & cv_mask & inner).sum()
    either = ((ours | cv_mask) & inner).sum()
    assert either > 50  # the scene does have corners
    assert both / either > 0.98, f"corner IoU {both / either:.3f}"


def test_fast_scores_match_cv2_nms(img):
    """With NMS on, surviving corner positions should match cv2 closely."""
    t = 20
    score = np.asarray(fast_score_map(np.float32(img)))
    keep = np.asarray(nms3(score)) & (score >= t)

    det = cv2.FastFeatureDetector_create(
        threshold=t, nonmaxSuppression=True,
        type=cv2.FastFeatureDetector_TYPE_9_16,
    )
    kps = det.detect(img)
    cv_pts = {(int(round(k.pt[1])), int(round(k.pt[0]))) for k in kps}
    ours_pts = {tuple(p) for p in np.argwhere(keep)}
    inner = lambda s: {(y, x) for (y, x) in s if 4 <= y < 236 and 4 <= x < 316}
    a, b = inner(ours_pts), inner(cv_pts)
    iou = len(a & b) / max(len(a | b), 1)
    assert iou > 0.9, f"NMS corner IoU {iou:.3f}"


def test_gaussian_blur_matches_cv2(img):
    ours = np.asarray(gaussian_blur7(np.float32(img)))
    ref = cv2.GaussianBlur(
        np.float32(img), (7, 7), 2, borderType=cv2.BORDER_REFLECT_101
    )
    np.testing.assert_allclose(ours, ref, atol=1e-2)


def test_resize_matches_cv2(img):
    ours = np.asarray(resize_bilinear(np.float32(img), 200, 267))
    ref = cv2.resize(np.float32(img), (267, 200), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours - ref).mean() < 0.5


def test_disc_mask_is_symmetric_circle():
    m = orb_disc_mask()
    assert m.shape == (31, 31)
    assert m[15, 0] and m[15, 30] and m[0, 15] and m[30, 15]
    np.testing.assert_array_equal(m, m[::-1])      # vertical symmetry
    np.testing.assert_array_equal(m, m[:, ::-1])   # horizontal symmetry


def _unpack_words(words):
    """(N, 8) uint32 -> (N, 32) uint8 bytes, matching cv2's layout."""
    b = np.zeros((len(words), 32), np.uint8)
    for w in range(8):
        for k in range(4):
            b[:, 4 * w + k] = (words[:, w] >> (8 * k)) & 0xFF
    return b


def test_descriptors_match_cv2_orb(img):
    """Our steered BRIEF at our keypoints/angles vs cv2 ORB.compute."""
    ext = ORBExtractor(n_features=300, n_levels=1)
    out = ext(img)
    x = np.asarray(out["x0"])
    y = np.asarray(out["y0"])
    ang = np.degrees(np.asarray(out["angle"]))
    val = np.asarray(out["valid"])
    desc = np.asarray(out["desc"])

    # interior keypoints only (cv2.compute drops near-border keypoints)
    sel = val & (x > 40) & (x < 280) & (y > 40) & (y < 200)
    idx = np.where(sel)[0][:100]
    kps = [
        cv2.KeyPoint(float(x[i]), float(y[i]), 31.0, float(ang[i]), 0.0, 0)
        for i in idx
    ]
    orb = cv2.ORB_create(nlevels=1, edgeThreshold=31, patchSize=31)
    kps_out, cv_desc = orb.compute(img, kps)
    assert len(kps_out) == len(idx)

    ours = _unpack_words(desc[idx])
    bit_diff = np.unpackbits(
        (ours ^ cv_desc).view(np.uint8), axis=1
    ).sum(axis=1)
    # small rounding differences (float vs uint8 blur, atan2 vs fastAtan2)
    # flip a few bits; descriptors must still be near-identical
    assert np.median(bit_diff) <= 8, f"median bit diff {np.median(bit_diff)}"
    assert (bit_diff <= 32).mean() > 0.9, f"bit diffs {bit_diff[:20]}"


def test_extractor_end_to_end(img):
    ext = ORBExtractor(n_features=500, n_levels=8)
    out = ext(img)
    val = np.asarray(out["valid"])
    assert len(val) <= ext.capacity
    assert val.sum() > 200  # textured scene fills most of the budget
    x, y = np.asarray(out["x0"])[val], np.asarray(out["y0"])[val]
    assert (x >= 0).all() and (x < 320).all()
    assert (y >= 0).all() and (y < 240).all()
    oct_ = np.asarray(out["octave"])[val]
    assert oct_.min() == 0 and oct_.max() >= 4  # multiple levels populated
    # spatial spread: keypoints cover at least half the 8-col grid
    cols = np.unique((x / 40).astype(int))
    assert len(cols) >= 6


def test_hamming_matrix_matches_cv2(img):
    ext = ORBExtractor(n_features=200, n_levels=1)
    out = ext(img)
    val = np.asarray(out["valid"])
    d = np.asarray(out["desc"])[val][:64]
    ours = np.asarray(hamming_matrix(d, d))
    bytes_ = _unpack_words(d)
    ref = np.array([
        [cv2.norm(bytes_[i], bytes_[j], cv2.NORM_HAMMING) for j in range(len(d))]
        for i in range(len(d))
    ])
    np.testing.assert_array_equal(ours, ref)


def test_camera_undistort_matches_cv2():
    cam = Camera(fx=718.856, fy=718.856, cx=607.19, cy=185.21,
                 k1=-0.28, k2=0.07, p1=1e-4, p2=-2e-4, width=1241, height=376)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1241, 200)
    y = rng.uniform(0, 376, 200)
    xu, yu = cam.undistort_points(x, y)
    pts = np.stack([x, y], axis=1).astype(np.float64)[:, None, :]
    dist = np.array([cam.k1, cam.k2, cam.p1, cam.p2])
    ref = cv2.undistortPoints(pts, cam.K, dist, P=cam.K)[:, 0, :]
    np.testing.assert_allclose(xu, ref[:, 0], atol=2e-2)
    np.testing.assert_allclose(yu, ref[:, 1], atol=2e-2)
