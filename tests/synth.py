"""Synthetic SO(3) rotation-averaging problem generators for tests/bench."""

import numpy as np
from scipy.spatial.transform import Rotation as Rsc


def make_problem(
    n=40,
    extra_edges=60,
    noise_deg=2.0,
    outlier_frac=0.0,
    seed=0,
    window_chords=None,
):
    """Chain + random chords graph with noisy relative rotations.

    Returns dict: edges (m,2) i<j, QQ (m,4) [x y z w], Q_gt (n,4), and a
    noisy spanning-tree-consistent structure. Convention: R_j = R_ij R_i.
    """
    rng = np.random.default_rng(seed)
    R_gt = Rsc.random(n, random_state=rng)
    Q_gt = R_gt.as_quat()  # [x y z w]

    edges = [(i, i + 1) for i in range(n - 1)]
    if window_chords:
        for i in range(n):
            for d in range(2, window_chords + 1):
                if i + d < n:
                    edges.append((i, i + d))
    seen = set(edges)
    while len(edges) < n - 1 + extra_edges:
        i, j = sorted(rng.choice(n, 2, replace=False))
        if (i, j) not in seen:
            seen.add((i, j))
            edges.append((int(i), int(j)))
    edges = np.array(edges, np.int32)
    m = len(edges)

    R_rel = R_gt[edges[:, 1]] * R_gt[edges[:, 0]].inv()
    noise = Rsc.from_rotvec(
        rng.normal(scale=np.deg2rad(noise_deg), size=(m, 3))
    )
    R_ij = noise * R_rel

    # Outliers go on chord (non-chain) edges, modelling bad loop closures;
    # sequential matching is reliable in practice, and the reference's
    # spanning-tree init walks the edge list in order (chain first).
    chord_idx = np.arange(n - 1, m)
    n_out = min(int(outlier_frac * m), len(chord_idx))
    if n_out:
        out_idx = rng.choice(chord_idx, n_out, replace=False)
        R_out = Rsc.random(n_out, random_state=rng)
        q = R_ij.as_quat()
        q[out_idx] = R_out.as_quat()
        R_ij = Rsc.from_quat(q)

    return {
        "edges": edges,
        "QQ": R_ij.as_quat().astype(np.float64),
        "Q_gt": Q_gt.astype(np.float64),
        "n": n,
        "m": m,
    }


def mean_geodesic_deg(Q1, Q2, align_to=0):
    """Mean geodesic distance (deg) between two rotation sets after gauge
    alignment (right-multiply so that rotation ``align_to`` coincides)."""
    R1 = Rsc.from_quat(np.asarray(Q1))
    R2 = Rsc.from_quat(np.asarray(Q2))
    G = R1[align_to].inv() * R2[align_to]
    R1g = R1 * G
    rel = R1g * R2.inv()
    ang = np.linalg.norm(rel.as_rotvec(), axis=1)
    return np.rad2deg(ang.mean())
