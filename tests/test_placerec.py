"""Place recognition: vocabulary training/transform/IO, scoring, database."""

import numpy as np
import pytest

from irotavg_tpu.placerec import ViewDatabase, Vocabulary, bow_score, train_vocabulary
from irotavg_tpu.placerec.vocabulary import _desc_to_words, _words_to_bytes


def _random_desc(rng, n):
    return rng.integers(0, 2**32, (n, 8), dtype=np.uint32)


@pytest.fixture(scope="module")
def vocab():
    rng = np.random.default_rng(0)
    images = [_random_desc(rng, 120) for _ in range(12)]
    return train_vocabulary(images, k=6, L=3, seed=0), images


def test_transform_produces_normalised_bow(vocab):
    v, images = vocab
    bow, nodes = v.transform(images[0])
    assert bow, "empty BoW"
    assert abs(sum(bow.values()) - 1.0) < 1e-9
    assert (np.asarray(nodes) >= 0).any()
    assert v.n_words > 30


def test_descent_matches_numpy_oracle(vocab):
    """Batched device descent == per-descriptor greedy walk."""
    v, images = vocab
    desc = images[3][:40]
    by = _words_to_bytes(desc)

    def walk(i):
        bits_i = np.unpackbits(by[i])
        cur = 0
        while True:
            ch = [c for c in v.children[cur] if c >= 0]
            if not ch:
                return cur
            ds = []
            for c in ch:
                cb = np.unpackbits(_words_to_bytes(v.node_desc[c : c + 1])[0])
                ds.append(int((bits_i != cb).sum()))
            cur = ch[int(np.argmin(ds))]

    from irotavg_tpu.placerec.vocabulary import _descend
    import jax.numpy as jnp

    leaf, _ = _descend(
        jnp.asarray(desc), jnp.ones(len(desc), bool),
        v._children_j, v._node_desc_j, v._is_leaf_j, v.L, 0,
    )
    expected = np.array([walk(i) for i in range(len(desc))])
    np.testing.assert_array_equal(np.asarray(leaf), expected)


def test_text_roundtrip(tmp_path, vocab):
    v, images = vocab
    p = tmp_path / "vocab.txt"
    v.save_text(str(p))
    v2 = Vocabulary.load_text(str(p))
    assert v2.k == v.k and v2.L == v.L and v2.n_words == v.n_words
    b1, n1 = v.transform(images[5])
    b2, n2 = v2.transform(images[5])
    assert b1.keys() == b2.keys()
    for k in b1:
        assert abs(b1[k] - b2[k]) < 1e-6
    np.testing.assert_array_equal(n1, n2)


def test_l1_score_properties(vocab):
    v, images = vocab
    b0, _ = v.transform(images[0])
    b1, _ = v.transform(images[1])
    assert abs(bow_score(b0, b0) - 1.0) < 1e-9       # self-similarity
    s01 = bow_score(b0, b1)
    assert 0.0 <= s01 < 0.9                           # random images differ
    # direct union-sum formula agrees with the common-words formulation
    union = b0.keys() | b1.keys()
    direct = 1.0 - 0.5 * sum(
        abs(b0.get(k, 0.0) - b1.get(k, 0.0)) for k in union
    )
    assert abs(s01 - direct) < 1e-12


def test_perturbed_image_scores_higher_than_random(vocab):
    v, images = vocab
    rng = np.random.default_rng(7)
    orig = images[2]
    # flip a few bits per descriptor (viewpoint/noise model)
    by = _words_to_bytes(orig)
    noise = rng.integers(0, 256, by.shape, dtype=np.uint8) & rng.integers(
        0, 2, by.shape, dtype=np.uint8
    )
    pert = _desc_to_words(by ^ (noise & 0x11))  # flip ~1 bit/byte
    b_orig, _ = v.transform(orig)
    b_pert, _ = v.transform(pert)
    b_other, _ = v.transform(images[9])
    assert bow_score(b_orig, b_pert) > bow_score(b_orig, b_other) + 0.1


def test_database_cascade(vocab):
    v, images = vocab
    db = ViewDatabase()
    bows = []
    for i, im in enumerate(images[:10]):
        b, _ = v.transform(im)
        bows.append(b)
        db.add(i, b)

    # query: image 3 revisited (slightly perturbed bow by reusing exact)
    query = bows[3]
    covis = lambda vid, n: [vid - 1, vid + 1][:n]
    score = lambda a, b: bow_score(a, b)

    # image 3 itself and its connected neighbours are excluded
    cands = db.detect_loop_candidates(
        query_id=3, bow=query, connected={2, 4}, min_score=0.2,
        covisibility_fn=covis, score_fn=score,
    )
    assert 3 not in cands and 2 not in cands and 4 not in cands
    # re-query as a new view 99 that looks exactly like view 3
    cands = db.detect_loop_candidates(
        query_id=99, bow=query, connected=set(), min_score=0.2,
        covisibility_fn=covis, score_fn=score,
    )
    assert 3 in cands, f"revisited place not found: {cands}"
    # unrelated queries find nothing above their own-score bar
    rng = np.random.default_rng(11)
    b_rand, _ = v.transform(_random_desc(rng, 120))
    cands = db.detect_loop_candidates(
        query_id=100, bow=b_rand, connected=set(), min_score=0.5,
        covisibility_fn=covis, score_fn=score,
    )
    assert cands == []


def test_database_erase(vocab):
    v, images = vocab
    db = ViewDatabase()
    b, _ = v.transform(images[0])
    db.add(0, b)
    db.erase(0)
    assert db.find_views_sharing_words(b, set()) == {}
