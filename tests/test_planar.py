"""Planar-scene degeneracy: the homography rescue in ransac_essential.

Coplanar correspondences satisfy a 3-parameter family ``{[v]x H}`` of
epipolar models, so minimal 8-point samples cannot pin the camera motion
(the reference survives via cv::findEssentialMat's 5-point solver,
src/ViewGraph.cpp:600-650).  ransac_essential handles it by decomposing a
least-squares homography (Faugeras) into motion hypotheses that join the
ordinary Sampson + cheirality vote.  These tests pin both the planar
failure-mode fix and non-planar non-regression.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsc

import jax
import jax.numpy as jnp

from irotavg_tpu import so3
from irotavg_tpu.geometry.essential import (
    _decompose_homography, _homography_ls, ransac_essential, recover_pose,
)

FOCAL = 500.0


def _scene(planar_frac, n=240, noise_px=0.5, seed=0, rot_deg=6.0):
    """Two views of a scene: ``planar_frac`` of points on one plane, the
    rest spread in depth.  Returns normalised correspondences + GT."""
    rng = np.random.default_rng(seed)
    n_pl = int(round(planar_frac * n))
    # plane z = 10 + 0.08 x + 0.05 y
    xy = rng.uniform([-4, -3], [4, 3], (n_pl, 2))
    z = 10.0 + 0.08 * xy[:, 0] + 0.05 * xy[:, 1]
    X_pl = np.concatenate([xy, z[:, None]], axis=1)
    X_off = rng.uniform([-4, -3, 5], [4, 3, 14], (n - n_pl, 3))
    X = np.concatenate([X_pl, X_off])
    axis = rng.normal(size=3)
    R = Rsc.from_rotvec(np.deg2rad(rot_deg) * axis / np.linalg.norm(axis))
    t = rng.normal(size=3)
    t /= np.linalg.norm(t)
    X2 = X @ R.as_matrix().T + t
    p1 = X[:, :2] / X[:, 2:3] + rng.normal(0, noise_px / FOCAL, (n, 2))
    p2 = X2[:, :2] / X2[:, 2:3] + rng.normal(0, noise_px / FOCAL, (n, 2))
    return p1, p2, R.as_matrix(), t


def _estimate(p1, p2, seed=0, **kw):
    valid = jnp.ones(len(p1), bool)
    E, inl, n = ransac_essential(
        jnp.asarray(p1), jnp.asarray(p2), valid, jax.random.key(seed),
        th_norm=1.0 / FOCAL, **kw,
    )
    R, t, _, _ = recover_pose(E, jnp.asarray(p1), jnp.asarray(p2), inl)
    return np.asarray(R), np.asarray(t), int(n)


def _rot_err(Ra, Rb):
    qa = np.asarray(so3.rotmat_to_quat(Ra))
    qb = np.asarray(so3.rotmat_to_quat(Rb))
    return np.degrees(float(so3.qgeodesic(qa, qb)))


def test_planar_dominant_scene_recovers_motion():
    for seed in (0, 1, 2):
        p1, p2, R_gt, t_gt = _scene(0.85, seed=seed)
        R, t, n = _estimate(p1, p2, seed=seed)
        err = _rot_err(R, R_gt)
        assert err < 1.0, f"planar 0.85 seed {seed}: rot err {err:.2f} deg"


def test_near_pure_plane_matches_5pt_oracle():
    """At 95% planarity (12 off-plane points) the twisted-pair ambiguity
    is barely observable and even cv2's adaptive 5-point lands at ~5 deg
    on some seeds; parity with that oracle — not an absolute bound — is
    the correct contract."""
    import cv2

    for seed in (0, 1, 2):
        p1, p2, R_gt, t_gt = _scene(0.95, seed=seed)
        R, t, n = _estimate(p1, p2, seed=seed)
        E5, _ = cv2.findEssentialMat(p1, p2, focal=1.0, pp=(0, 0),
                                     method=cv2.RANSAC, prob=0.999,
                                     threshold=1.0 / FOCAL)
        _, R5, _, _ = cv2.recoverPose(E5[:3], p1, p2)
        err = _rot_err(R, R_gt)
        err5 = _rot_err(R5, R_gt)
        assert err < max(1.0, err5 + 1.0), (
            f"seed {seed}: ours {err:.2f} deg vs 5-point oracle {err5:.2f}"
        )


def test_planar_failure_without_rescue():
    """Documents the failure mode the rescue exists for: with the
    homography pool disabled, at least one strongly-planar instance
    breaks (>2 deg).  If this ever passes with margin, the 8-point
    sampler got better and the rescue may be reconsidered."""
    errs = []
    for seed in (0, 1, 2):
        p1, p2, R_gt, _ = _scene(0.95, seed=seed)
        R, _, _ = _estimate(p1, p2, seed=seed, h_samples=0)
        errs.append(_rot_err(R, R_gt))
    assert max(errs) > 2.0, f"8-point alone now fine on planar? {errs}"


def test_nonplanar_unaffected_by_rescue():
    """General scenes: the H-derived candidates must not displace the
    correct model (they join the same vote)."""
    for seed in (0, 1, 2):
        p1, p2, R_gt, _ = _scene(0.3, seed=seed)
        R_with, _, _ = _estimate(p1, p2, seed=seed)
        R_wo, _, _ = _estimate(p1, p2, seed=seed, h_samples=0)
        assert _rot_err(R_with, R_gt) < 1.0
        assert _rot_err(R_wo, R_gt) < 1.0


def test_decompose_homography_exact():
    """A noise-free plane-induced homography decomposes to the true
    motion among its 8 hypotheses."""
    rng = np.random.default_rng(7)
    R = Rsc.from_rotvec(np.deg2rad(9.0) * np.array([0.2, 0.9, -0.4])
                        / np.linalg.norm([0.2, 0.9, -0.4]))
    t = np.array([0.6, -0.2, 0.15])
    nvec = np.array([0.05, -0.08, 1.0])
    nvec /= np.linalg.norm(nvec)
    d = 10.0
    H = R.as_matrix() + np.outer(t, nvec) / d
    Rs, ts = _decompose_homography(jnp.asarray(H / np.linalg.norm(H)))
    errs = [
        _rot_err(np.asarray(Rs[k]), R.as_matrix())
        + np.degrees(np.arccos(np.clip(abs(
            np.dot(np.asarray(ts[k]), t / np.linalg.norm(t))), -1, 1)))
        for k in range(8)
    ]
    assert min(errs) < 0.1, f"best hypothesis off by {min(errs):.3f} deg"


def test_homography_ls_fits_plane():
    p1, p2, R_gt, t_gt = _scene(1.0, n=150, noise_px=0.3, seed=3)
    w = jnp.ones(len(p1))
    H = np.asarray(_homography_ls(jnp.asarray(p1), jnp.asarray(p2), w))
    x1h = np.concatenate([p1, np.ones((len(p1), 1))], 1)
    y = x1h @ H.T
    err = np.abs(y[:, :2] / y[:, 2:3] - p2).max() * FOCAL
    assert err < 3.0, f"max transfer error {err:.2f} px"
