"""Native C++ host kernels vs their Python fallbacks."""

import os

import numpy as np
import pytest

from irotavg_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_vocab_parse_matches_python(tmp_path):
    from irotavg_tpu.placerec.vocabulary import Vocabulary, train_vocabulary

    rng = np.random.default_rng(3)
    descs = [rng.integers(0, 2**32, (100, 8), dtype=np.uint32)
             for _ in range(4)]
    v = train_vocabulary(descs, k=3, L=3, seed=0)
    p = tmp_path / "vocab.txt"
    v.save_text(str(p))

    v_native = Vocabulary.load_text(str(p))
    os.environ["IROTAVG_NO_NATIVE"] = "1"
    try:
        # force the pure-Python parser path
        native._lib = None
        native._tried = False
        assert not native.available()
        v_py = Vocabulary.load_text(str(p))
    finally:
        del os.environ["IROTAVG_NO_NATIVE"]
        native._tried = False

    assert v_native.k == v_py.k and v_native.L == v_py.L
    np.testing.assert_array_equal(v_native.children, v_py.children)
    np.testing.assert_array_equal(v_native.node_desc, v_py.node_desc)
    np.testing.assert_array_equal(v_native.word_id, v_py.word_id)
    np.testing.assert_allclose(v_native.weight, v_py.weight, rtol=1e-12)
    assert v_native.scoring == v_py.scoring


def test_spanning_tree_init_matches_python():
    from irotavg_tpu.solver.init import init_mst
    from synth import make_problem

    p = make_problem(n=200, extra_edges=150, noise_deg=3.0, seed=4)
    Q = np.zeros((200, 4))
    Q[0] = (0, 0, 0, 1)

    Q_native = init_mst(Q, p["QQ"], p["edges"], 1)

    os.environ["IROTAVG_NO_NATIVE"] = "1"
    try:
        native._lib = None
        native._tried = False
        Q_py = init_mst(Q, p["QQ"], p["edges"], 1)
    finally:
        del os.environ["IROTAVG_NO_NATIVE"]
        native._tried = False

    np.testing.assert_allclose(Q_native, Q_py, atol=1e-14)


def test_spanning_tree_disconnected_raises():
    from irotavg_tpu.solver.init import DisconnectedGraphError, init_mst

    edges = np.array([[0, 1], [2, 3]], np.int32)  # two components
    QQ = np.tile([0.0, 0.0, 0.0, 1.0], (2, 1))
    Q = np.tile([0.0, 0.0, 0.0, 1.0], (4, 1))
    with pytest.raises(DisconnectedGraphError):
        init_mst(Q, QQ, edges, 1)


def test_bow_l1_scores_matches_python():
    from irotavg_tpu.placerec.bow import bow_score

    rng = np.random.default_rng(5)

    def rand_bow(n):
        ids = np.sort(rng.choice(1000, n, replace=False))
        w = rng.random(n)
        w /= w.sum()
        return dict(zip(ids.tolist(), w.tolist()))

    q = rand_bow(40)
    cands = [rand_bow(rng.integers(5, 60)) for _ in range(20)]

    q_ids = np.fromiter(q.keys(), np.int64)
    q_w = np.fromiter(q.values(), np.float64)
    c_ids = np.concatenate([np.fromiter(c.keys(), np.int64) for c in cands])
    c_w = np.concatenate([np.fromiter(c.values(), np.float64)
                          for c in cands])
    c_off = np.cumsum([0] + [len(c) for c in cands]).astype(np.int64)

    scores = native.bow_l1_scores(q_ids, q_w, c_ids, c_w, c_off)
    expect = np.array([bow_score(q, c) for c in cands])
    np.testing.assert_allclose(scores, expect, atol=1e-12)
