"""Batched essential-matrix estimation (8-point RANSAC) and pose recovery.

Contract parity with cv::findEssentialMat(..., RANSAC, prob, th) +
cv::recoverPose as used by `ViewGraph::findRelativePose`
(src/ViewGraph.cpp:600-650): normalised image coordinates, Sampson
distance threshold ``th / focal``, cheirality by triangulated-depth
counting with a 50-unit distance cutoff.  Deliberate divergence: the
hypothesis solver is the 8-point algorithm over a fixed batch of S random
minimal samples (vs OpenCV's adaptive-count Nister 5-point) — on TPU the
whole hypothesis batch solves as one (S, 9, 9) eigendecomposition, and S
is sized for inlier ratios well below SLAM operating points.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DIST_THRESH = 50.0  # cv::recoverPose triangulated-distance cutoff


def _eigvec_smallest(M):
    """Eigenvector of the smallest eigenvalue of symmetric (..., k, k)."""
    w, v = jnp.linalg.eigh(M)
    return v[..., :, 0]


@functools.partial(jax.jit, inline=True)
def sampson_distance(E, p1, p2):
    """Squared Sampson distance for (..., 3, 3) E against (N, 2) normalised
    points; broadcasts E's leading axes -> (..., N)."""
    x1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], axis=1)  # (N, 3)
    x2 = jnp.concatenate([p2, jnp.ones_like(p2[:, :1])], axis=1)
    Ex1 = jnp.einsum("...ij,nj->...ni", E, x1)
    Etx2 = jnp.einsum("...ji,nj->...ni", E, x2)
    num = jnp.einsum("ni,...ni->...n", x2, Ex1) ** 2
    den = (
        Ex1[..., :, 0] ** 2 + Ex1[..., :, 1] ** 2
        + Etx2[..., :, 0] ** 2 + Etx2[..., :, 1] ** 2
    )
    return num / jnp.maximum(den, 1e-18)


def _eight_point(p1, p2, weights):
    """Weighted 8-point solve -> (..., 3, 3) E candidates (unprojected).

    p1, p2: (N, 2); weights: (..., N) selecting/weighting rows.
    """
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=1
    )  # (N, 9)
    AtA = jnp.einsum("...n,ni,nj->...ij", weights, A, A)
    e = _eigvec_smallest(AtA)
    return e.reshape(e.shape[:-1] + (3, 3))


def _project_essential(E):
    """Nearest essential matrix: singular values -> (1, 1, 0)."""
    U, s, Vt = jnp.linalg.svd(E)
    d = jnp.asarray([1.0, 1.0, 0.0], E.dtype)
    return U @ (d[..., :, None] * Vt)


@functools.partial(
    jax.jit, static_argnames=("n_samples",), inline=True
)
def ransac_essential(p1, p2, valid, key, *, th_norm, n_samples=1024):
    """RANSAC essential matrix from (N, 2) normalised correspondences.

    Returns (E (3,3), inlier_mask (N,), n_inliers).  ``th_norm`` is the
    Sampson threshold in normalised coords (pixel_th / focal).
    """
    n = p1.shape[0]
    w = valid.astype(p1.dtype)

    # S minimal samples of 8 correspondences (masked categorical draw)
    logits = jnp.where(valid, 0.0, -jnp.inf)
    idx = jax.random.categorical(
        key, logits[None, :], shape=(n_samples, 8)
    )  # (S, 8)
    sel = jnp.zeros((n_samples, n), p1.dtype)
    sel = jax.vmap(lambda s, i: s.at[i].add(1.0))(sel, idx)

    E_cand = _eight_point(p1, p2, sel)          # (S, 3, 3)
    E_cand = _project_essential(E_cand)
    d = sampson_distance(E_cand, p1, p2)        # (S, N)
    th2 = th_norm * th_norm
    inl = (d < th2) & valid[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)

    # refit on the best sample's inliers (least squares over all inliers)
    best_inl = inl[best].astype(p1.dtype)
    E_ref = _project_essential(_eight_point(p1, p2, best_inl))
    d_ref = sampson_distance(E_ref, p1, p2)
    inl_ref = (d_ref < th2) & valid
    # keep the refit only if it did not lose inliers
    better = jnp.sum(inl_ref) >= scores[best]
    E_out = jnp.where(better, E_ref, E_cand[best])
    inl_out = jnp.where(better, inl_ref, inl[best])
    return E_out, inl_out, jnp.sum(inl_out)


def _triangulate(R, t, p1, p2):
    """Linear (DLT) triangulation for P1=[I|0], P2=[R|t].

    R: (..., 3, 3), t: (..., 3); p1, p2: (N, 2) normalised.
    Returns X (..., N, 3) in camera-1 frame and depths (z1, z2).
    """
    P2 = jnp.concatenate([R, t[..., :, None]], axis=-1)  # (..., 3, 4)
    # rows of A per point: x1*P1[2]-P1[0]; y1*P1[2]-P1[1]; same for P2
    N = p1.shape[0]
    e = jnp.eye(3, 4, dtype=p1.dtype)
    r0 = p1[:, 0:1] * e[2] - e[0]  # (N, 4)
    r1 = p1[:, 1:2] * e[2] - e[1]
    P2b = jnp.broadcast_to(P2[..., None, :, :], P2.shape[:-2] + (N, 3, 4))
    r2 = p2[:, 0:1] * P2b[..., 2, :] - P2b[..., 0, :]
    r3 = p2[:, 1:2] * P2b[..., 2, :] - P2b[..., 1, :]
    A = jnp.stack(
        [jnp.broadcast_to(r0, r2.shape), jnp.broadcast_to(r1, r3.shape),
         r2, r3],
        axis=-2,
    )  # (..., N, 4, 4)
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    Xh = _eigvec_smallest(AtA)  # (..., N, 4)
    w = Xh[..., 3]
    X = Xh[..., :3] / jnp.where(jnp.abs(w) > 1e-12, w, 1e-12)[..., None]
    z1 = X[..., 2]
    z2 = jnp.einsum("...ij,...nj->...ni", R, X)[..., 2] + t[..., None, 2]
    return X, z1, z2


@functools.partial(jax.jit, inline=True)
def recover_pose(E, p1, p2, inlier_mask):
    """Cheirality-checked (R, t) from E (cv::recoverPose contract).

    Returns (R, t, n_cheirality, pose_mask) with x2 ~ R x1 + t.
    """
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None, None]
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                    E.dtype)
    Ra = U @ W @ Vt
    Rb = U @ W.T @ Vt
    tu = U[..., :, 2]
    Rs = jnp.stack([Ra, Ra, Rb, Rb])           # (4, 3, 3)
    ts = jnp.stack([tu, -tu, tu, -tu])          # (4, 3)

    X, z1, z2 = _triangulate(Rs, ts, p1, p2)    # (4, N, ...)
    dist = jnp.linalg.norm(X, axis=-1)
    good = (
        (z1 > 0) & (z2 > 0) & (dist < DIST_THRESH) & inlier_mask[None, :]
    )
    counts = jnp.sum(good, axis=1)
    k = jnp.argmax(counts)
    return Rs[k], ts[k], counts[k], good[k]
