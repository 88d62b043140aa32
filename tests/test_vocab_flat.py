"""Level-synchronous flat vocabulary trainer (production-scale path)."""

import os
import tempfile

import numpy as np

from irotavg_tpu.placerec.bow import bow_score
from irotavg_tpu.placerec.vocabulary import (
    Vocabulary, _descend_np, _words_to_bytes, train_vocabulary_flat,
)


def _noisy_images(rng, n_img=20, per=200, n_base=800, flip_bits=5):
    base = rng.integers(0, 2 ** 32, (n_base, 8), dtype=np.uint64
                        ).astype(np.uint32)
    imgs = []
    for _ in range(n_img):
        d = base[rng.integers(0, n_base, per)].copy()
        for _ in range(flip_bits):
            w = rng.integers(0, 8, per)
            b = rng.integers(0, 32, per).astype(np.uint32)
            d[np.arange(per), w] ^= np.uint32(1) << b
        imgs.append(d)
    return imgs


def test_flat_trainer_structure_and_io():
    rng = np.random.default_rng(0)
    imgs = _noisy_images(rng)
    v = train_vocabulary_flat(imgs, k=4, L=3, seed=1, iters=4)
    assert v.n_words == 4 ** 3
    # complete tree: every interior node has k children, leaves none
    interior = ~v.is_leaf
    assert (v.children[interior] >= 0).all()
    assert (v.children[v.is_leaf] == -1).all()
    # weights: non-negative, at least some words populated
    assert (v.weight >= 0).all() and (v.weight > 0).sum() > 10

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "v.txt")
        v.save_text(p)
        v2 = Vocabulary.load_text(p)
        assert v2.n_words == v.n_words
        b1, n1 = v.transform(imgs[0])
        b2, n2 = v2.transform(imgs[0])
        # same words; weights agree to the text format's %.6g precision
        assert set(b1) == set(b2)
        np.testing.assert_allclose(
            [b1[k] for k in sorted(b1)], [b2[k] for k in sorted(b2)],
            rtol=1e-5,
        )
        np.testing.assert_array_equal(n1, n2)


def test_flat_trainer_numpy_descent_matches_jax_transform():
    rng = np.random.default_rng(3)
    imgs = _noisy_images(rng, n_img=8)
    v = train_vocabulary_flat(imgs, k=3, L=2, seed=2, iters=3)
    # rebuild the per-level center table from the node array
    first = np.cumsum([0] + [3 ** d for d in range(3)])
    levels = [
        _words_to_bytes(v.node_desc[first[d + 1]:first[d + 2]])
        for d in range(2)
    ]
    B = _words_to_bytes(imgs[0])
    leaf_np = _descend_np(levels, B, 3)
    leaf_jax, _ = v.descend(np.asarray(imgs[0], np.uint32))
    wid_jax = v.word_id[np.asarray(leaf_jax)]
    np.testing.assert_array_equal(leaf_np, wid_jax)


def test_flat_trainer_discriminative():
    rng = np.random.default_rng(5)
    imgs = _noisy_images(rng, n_img=16, per=300)
    v = train_vocabulary_flat(imgs, k=8, L=3, seed=0, iters=4)
    b0, _ = v.transform(imgs[0])
    # noisy re-observation of image 0
    d = imgs[0].copy()
    per = len(d)
    for _ in range(3):
        w = rng.integers(0, 8, per)
        b = rng.integers(0, 32, per).astype(np.uint32)
        d[np.arange(per), w] ^= np.uint32(1) << b
    b0n, _ = v.transform(d)
    b1, _ = v.transform(imgs[1])
    assert bow_score(b0, b0n) > 2.0 * bow_score(b0, b1)
