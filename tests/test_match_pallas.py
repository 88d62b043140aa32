"""Fused Pallas matcher kernel vs the dense jnp golden model."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from irotavg_tpu.ops.hamming import hamming_matrix
from irotavg_tpu.ops.match_pallas import (
    GATES, best2_reference, fused_best2, make_colft, make_rowf, unpack_pm1,
)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    n1, n2 = 200, 300   # deliberately not multiples of 128
    d1 = rng.integers(0, 2**32, (n1, 8), dtype=np.uint32)
    d2 = rng.integers(0, 2**32, (n2, 8), dtype=np.uint32)
    # plant near-duplicates so best/second-best are non-trivial
    d2[10] = d1[0]
    d2[11] = d1[0] ^ np.uint32(1)
    meta = {
        "valid1": rng.random(n1) > 0.1,
        "valid2": rng.random(n2) > 0.1,
        "node1": rng.integers(0, 12, n1),
        "node2": rng.integers(0, 12, n2),
        "x1": rng.uniform(0, 640, n1), "y1": rng.uniform(0, 480, n1),
        "x2": rng.uniform(0, 640, n2), "y2": rng.uniform(0, 480, n2),
        "oct1": rng.integers(0, 8, n1), "oct2": rng.integers(0, 8, n2),
    }
    return d1, d2, meta


def _features(gate, d1, d2, m):
    bits1 = unpack_pm1(d1)
    bits2t = unpack_pm1(d2).T
    if gate in ("none", "node"):
        rowf = make_rowf(m["valid1"], node=m["node1"])
        colft = make_colft(m["valid2"], node=m["node2"])
    elif gate == "local":
        rowf = make_rowf(m["valid1"], x=m["x1"], y=m["y1"],
                         octave=m["oct1"],
                         th=np.full(len(m["x1"]), 60.0, np.float32))
        colft = make_colft(m["valid2"], x=m["x2"], y=m["y2"],
                           octave=m["oct2"])
    else:  # epipolar variants
        F = np.array([[0, 1e-4, -0.02], [-1e-4, 0, 0.03], [0.02, -0.03, 1]])
        a = m["x2"] * F[0, 0] + m["y2"] * F[1, 0] + F[2, 0]
        b = m["x2"] * F[0, 1] + m["y2"] * F[1, 1] + F[2, 1]
        c = m["x2"] * F[0, 2] + m["y2"] * F[1, 2] + F[2, 2]
        th = 3.84 * (1.2 ** m["oct1"].astype(np.float64)) ** 2 * 40
        rowf = make_rowf(m["valid1"], node=m["node1"], x=m["x1"],
                         y=m["y1"], th=th)
        colft = make_colft(m["valid2"], node=m["node2"], a=a, b=b, c=c)
    return bits1, bits2t, rowf, colft


@pytest.mark.parametrize("gate", GATES)
def test_kernel_matches_reference(problem, gate):
    """interpret-mode Pallas == dense jnp on every gate type."""
    d1, d2, m = problem
    bits1, bits2t, rowf, colft = _features(gate, d1, d2, m)
    ref = best2_reference(bits1, bits2t, rowf, colft, gate)
    os.environ["IROTAVG_PALLAS"] = "interpret"
    try:
        got = fused_best2(bits1, bits2t, rowf, colft, gate)
    finally:
        del os.environ["IROTAVG_PALLAS"]
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]),
                                  err_msg=f"d1 mismatch [{gate}]")
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]),
                                  err_msg=f"d2 mismatch [{gate}]")
    # idx: only rows with a real match must agree (both use first-argmin)
    has = np.asarray(ref[0]) < 10_000
    np.testing.assert_array_equal(np.asarray(got[2])[has],
                                  np.asarray(ref[2])[has])


def test_mxu_distance_identity(problem):
    """128 - 0.5*<±1, ±1> equals the XOR+popcount Hamming distance."""
    d1, d2, _ = problem
    bits1 = unpack_pm1(d1).astype(jnp.float32)
    bits2 = unpack_pm1(d2).astype(jnp.float32)
    D_mxu = 128.0 - 0.5 * (bits1 @ bits2.T)
    D_ref = hamming_matrix(jnp.asarray(d1), jnp.asarray(d2))
    np.testing.assert_array_equal(np.asarray(D_mxu).astype(np.int32),
                                  np.asarray(D_ref))


def test_matchers_agree_between_paths(problem):
    """Frame-level matchers give identical results jnp vs interpret."""
    from irotavg_tpu.matching.matchers import match_locally

    d1, d2, m = problem

    class F:
        pass

    f1, f2 = F(), F()
    f1.desc, f1.valid, f1.octave = d1, m["valid1"], m["oct1"]
    f1.xu, f1.yu = m["x1"], m["y1"]
    f1.angle = np.zeros(len(d1), np.float32)
    f1.feat_nodes = None
    f2.desc, f2.valid, f2.octave = d2, m["valid2"], m["oct2"]
    f2.xu, f2.yu = m["x2"], m["y2"]
    f2.angle = np.zeros(len(d2), np.float32)
    f2.feat_nodes = None

    a = match_locally(f1, f2, radius=80.0)
    os.environ["IROTAVG_PALLAS"] = "interpret"
    try:
        b = match_locally(f1, f2, radius=80.0)
    finally:
        del os.environ["IROTAVG_PALLAS"]
    np.testing.assert_array_equal(a, b)
