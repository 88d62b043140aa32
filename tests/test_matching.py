"""Matcher tests on synthetically warped image pairs (known geometry)."""

import cv2
import numpy as np
import pytest

from irotavg_tpu.frontend import Camera, Frame, ORBExtractor
from irotavg_tpu.matching import (
    match_by_bow,
    match_epipolar,
    match_locally,
    matches_to_pairs,
    rotation_consistency_filter,
)


def _scene(seed=1, size=(320, 240)):
    rng = np.random.default_rng(seed)
    im = np.full((size[1], size[0]), 120, np.uint8)
    for _ in range(50):
        x, y = rng.integers(10, size[0] - 20), rng.integers(10, size[1] - 20)
        w, h = rng.integers(8, 40), rng.integers(8, 40)
        cv2.rectangle(im, (int(x), int(y)), (int(x + w), int(y + h)),
                      int(rng.integers(0, 255)), -1)
    for _ in range(30):
        c = (int(rng.integers(15, size[0] - 15)), int(rng.integers(15, size[1] - 15)))
        cv2.circle(im, c, int(rng.integers(3, 12)), int(rng.integers(0, 255)), -1)
    return im


@pytest.fixture(scope="module")
def pair():
    im1 = _scene()
    # small rotation + translation warp
    M = cv2.getRotationMatrix2D((160, 120), 5.0, 1.0)
    M[:, 2] += (6.0, -4.0)
    im2 = cv2.warpAffine(im1, M, (320, 240), borderValue=120)
    cam = Camera(fx=300, fy=300, cx=160, cy=120, width=320, height=240)
    ext = ORBExtractor(n_features=600, n_levels=4)
    f1 = Frame(0, im1, ext, cam)
    f2 = Frame(1, im2, ext, cam)
    return f1, f2, M


def _inlier_frac(f1, f2, M, pairs, tol=3.0):
    if len(pairs) == 0:
        return 0.0
    p1 = np.stack([f1.x[pairs[:, 0]], f1.y[pairs[:, 0]], np.ones(len(pairs))], 1)
    pred = p1 @ M.T
    d = np.hypot(pred[:, 0] - f2.x[pairs[:, 1]], pred[:, 1] - f2.y[pairs[:, 1]])
    return float((d < tol).mean())


def test_local_matching_tracks_warp(pair):
    f1, f2, M = pair
    m = match_locally(f2, f1, radius=40)  # curr -> prev, motion-free guess
    pairs = matches_to_pairs(m)
    assert len(pairs) > 80, f"only {len(pairs)} local matches"
    Minv = cv2.invertAffineTransform(M)
    frac = _inlier_frac(f2, f1, Minv, pairs)
    assert frac > 0.85, f"inlier fraction {frac:.2f}"


def test_local_matching_one_to_one(pair):
    f1, f2, _ = pair
    m = match_locally(f2, f1, radius=40)
    tgt = m[m >= 0]
    assert len(np.unique(tgt)) == len(tgt), "duplicate targets"


def test_bow_matching_without_vocab_uses_global_search(pair):
    f1, f2, M = pair
    m = match_by_bow(f2, f1, nnratio=0.9)
    pairs = matches_to_pairs(m)
    assert len(pairs) > 60
    Minv = cv2.invertAffineTransform(M)
    frac = _inlier_frac(f2, f1, Minv, pairs)
    assert frac > 0.8, f"inlier fraction {frac:.2f}"


def test_epipolar_gate_rejects_off_line(pair):
    f1, f2, M = pair
    # pure-translation fundamental matrix for the known warp is degenerate;
    # instead verify the gate behavior directly: with a huge-sigma F that
    # accepts everything the matcher reduces to nearest-neighbour-under-50
    F_loose = np.eye(3) * 1e-9  # den ~ 0 -> gate rejects all
    m = match_epipolar(f2, f1, F_loose)
    assert (m >= 0).sum() == 0  # degenerate lines reject everything


def test_rotation_histogram_keeps_dominant_rotation(pair):
    f1, f2, _ = pair
    import jax.numpy as jnp

    n1 = len(f1.angle)
    rng = np.random.default_rng(0)
    # synthetic assignment: all rows match identity with consistent angles,
    # except 10 rows with wildly different rotation
    matches = np.arange(n1, dtype=np.int32)
    a1 = np.full(n1, 0.5, np.float32)
    a2 = np.full(n1, 0.3, np.float32)  # delta ~ 11.5 deg -> one bin
    bad = rng.choice(n1, 10, replace=False)
    a2[bad] = a1[bad] - np.deg2rad(170.0)  # isolated bin
    out = np.asarray(
        rotation_consistency_filter(
            jnp.asarray(matches), jnp.asarray(a1), jnp.asarray(a2)
        )
    )
    assert (out[bad] == -1).all()
    good = np.setdiff1d(np.arange(n1), bad)
    assert (out[good] >= 0).all()
