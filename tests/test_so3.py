"""Unit tests for batched SO(3)/quaternion kernels against closed forms and
scipy.spatial.transform.Rotation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsc

from irotavg_tpu import so3


def _rand_q(n, seed=0):
    return so3.random_quat(jax.random.PRNGKey(seed), (n,), dtype=jnp.float64)


def test_qmul_matches_scipy():
    q1 = np.array(_rand_q(64, 1))
    q2 = np.array(_rand_q(64, 2))
    got = np.asarray(so3.qmul(jnp.asarray(q1), jnp.asarray(q2)))
    # scipy quat layout is also [x y z w]; R(a)*R(b) composition = a*b product.
    want = (Rsc.from_quat(q1) * Rsc.from_quat(q2)).as_quat()
    # double cover: compare up to sign
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, sign * want, atol=1e-12)


def test_qmul_identity_and_inverse():
    q = _rand_q(32)
    ident = so3.qidentity((32,), dtype=jnp.float64)
    np.testing.assert_allclose(so3.qmul(q, ident), q, atol=1e-15)
    np.testing.assert_allclose(so3.qmul(ident, q), q, atol=1e-15)
    prod = so3.qmul(q, so3.qconj(q))
    np.testing.assert_allclose(prod, ident, atol=1e-12)


def test_qinv_flipw_same_rotation():
    q = _rand_q(16)
    R1 = so3.quat_to_rotmat(so3.qconj(q))
    R2 = so3.quat_to_rotmat(so3.qinv_flipw(q))
    np.testing.assert_allclose(R1, R2, atol=1e-12)


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(3)
    v = jax.random.normal(key, (128, 3), dtype=jnp.float64)
    # keep |v| < pi so log(exp(v)) == v
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True) * jax.random.uniform(
        jax.random.PRNGKey(4), (128, 1), minval=1e-8, maxval=3.1, dtype=jnp.float64
    )
    q = so3.exp_map(v)
    np.testing.assert_allclose(jnp.linalg.norm(q, axis=-1), 1.0, atol=1e-12)
    back = so3.log_map(q)
    np.testing.assert_allclose(back[:, :3], v, atol=1e-9)
    np.testing.assert_allclose(back[:, 3], jnp.linalg.norm(v, axis=-1), atol=1e-9)


def test_exp_map_zero_is_identity():
    q = so3.exp_map(jnp.zeros((4, 3), dtype=jnp.float64))
    np.testing.assert_allclose(q, so3.qidentity((4,), dtype=jnp.float64))


def test_log_map_identity_is_zero():
    w = so3.log_map(so3.qidentity((4,), dtype=jnp.float64))
    np.testing.assert_allclose(w, 0.0)


def test_log_map_negated_quat_wraps():
    # -q is the same rotation; theta must wrap into [-pi, pi)
    q = _rand_q(64, 7)
    w1 = so3.log_map(q)
    w2 = so3.log_map(-q)
    # same rotation => same |angle| after wrapping, axes aligned up to sign
    np.testing.assert_allclose(np.abs(w1[:, 3]), np.abs(w2[:, 3]), atol=1e-9)


def test_exp_log_matches_scipy():
    key = jax.random.PRNGKey(5)
    v = jax.random.normal(key, (64, 3), dtype=jnp.float64) * 0.7
    q = np.asarray(so3.exp_map(v))
    want = Rsc.from_rotvec(np.array(v)).as_quat()
    sign = np.sign(np.sum(q * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(q, sign * want, atol=1e-12)


def test_rotmat_roundtrip():
    q = _rand_q(256, 11)
    R = so3.quat_to_rotmat(q)
    # orthonormality
    eye = jnp.eye(3, dtype=jnp.float64)
    np.testing.assert_allclose(
        jnp.einsum("nij,nkj->nik", R, R), jnp.broadcast_to(eye, R.shape), atol=1e-12
    )
    q2 = so3.rotmat_to_quat(R)
    sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q, sign * q2, atol=1e-9)


def test_rotmat_matches_scipy():
    q = np.array(_rand_q(64, 13))
    got = np.asarray(so3.quat_to_rotmat(jnp.asarray(q)))
    want = Rsc.from_quat(q).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_rotmat_to_quat_near_pi_rotations():
    # Degenerate trace ~ -1 cases exercise the non-w Shepperd branches.
    axes = np.eye(3)
    for ax in axes:
        R = Rsc.from_rotvec(ax * (np.pi - 1e-7)).as_matrix()
        q = np.array(so3.rotmat_to_quat(jnp.asarray(R)))
        want = Rsc.from_quat(q).as_matrix()
        np.testing.assert_allclose(want, R, atol=1e-6)


def test_delta_rel_consistent_graph_gives_identity():
    # Build Q from ground truth; QQ consistent: QQ_k = Q[j] * Q[i]^-1
    q = _rand_q(10, 17)
    edges = jnp.asarray([[0, 1], [1, 2], [2, 3], [0, 5], [4, 9]])
    QQ = so3.qmul(q[edges[:, 1]], so3.qconj(q[edges[:, 0]]))
    d = so3.delta_rel(edges, QQ, q)
    ang = so3.qangle(d)
    np.testing.assert_allclose(ang, 0.0, atol=1e-9)


def test_qgeodesic():
    q = _rand_q(8, 19)
    np.testing.assert_allclose(so3.qgeodesic(q, q), 0.0, atol=1e-9)
    v = jnp.asarray([[0.3, 0.0, 0.0]], dtype=jnp.float64)
    q2 = so3.qmul(q, jnp.broadcast_to(so3.exp_map(v), q.shape))
    np.testing.assert_allclose(so3.qgeodesic(q, q2), 0.3, atol=1e-9)


def test_jit_and_vmap_compatible():
    q = _rand_q(16, 23)
    f = jax.jit(lambda a: so3.log_map(so3.qmul(a, a)))
    np.testing.assert_allclose(f(q), so3.log_map(so3.qmul(q, q)), atol=1e-12)
    g = jax.vmap(so3.exp_map)
    v = jnp.ones((4, 8, 3), dtype=jnp.float64) * 0.1
    assert g(v).shape == (4, 8, 4)


def test_random_quat_uniformity():
    q = np.array(so3.random_quat(jax.random.PRNGKey(0), (5000,), jnp.float64))
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-6)
    # mean rotation matrix of uniform rotations ~ 0
    R = Rsc.from_quat(q).as_matrix()
    assert np.abs(R.mean(axis=0)).max() < 0.05
