"""FramePrefetcher parity: batched look-ahead extraction must produce
exactly the Frames the per-image constructor does (same pyramid program,
split inside the batched program — frontend/prefetch.py)."""

import numpy as np
import pytest

from irotavg_tpu.frontend import Camera, Frame, FramePrefetcher, ORBExtractor
from irotavg_tpu.frontend.prefetch import sample_descriptors
from irotavg_tpu.placerec import train_vocabulary


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    h, w = 96, 128
    base = rng.integers(0, 255, (h * 2, w * 2), np.uint8)
    imgs = [np.ascontiguousarray(base[dy:dy + h, dx:dx + w])
            for dy, dx in [(0, 0), (3, 5), (7, 2), (11, 9), (15, 4),
                           (20, 13), (24, 6)]]
    cam = Camera(fx=100.0, fy=100.0, cx=w / 2, cy=h / 2, width=w, height=h)
    ext = ORBExtractor(n_features=60, n_levels=3)
    return imgs, cam, ext


def test_prefetcher_matches_direct_extraction(setup):
    imgs, cam, ext = setup
    pf = FramePrefetcher(imgs, ext, cam, batch=4)
    for i in (0, 3, 6):            # first batch, mid, padded tail batch
        got = pf.frame(i)
        want = Frame(i, imgs[i], ext, cam)
        assert got.id == i
        np.testing.assert_array_equal(got.valid, want.valid)
        np.testing.assert_array_equal(got.desc, want.desc)
        np.testing.assert_allclose(got.xu, want.xu, atol=1e-5)
        np.testing.assert_allclose(got.angle, want.angle, atol=1e-5)


def test_prefetcher_batched_bow_matches_per_frame_transform(setup):
    imgs, cam, ext = setup
    sample = sample_descriptors(imgs, ext, batch=4, cap=200)
    assert len(sample) == len(imgs) and all(s.dtype == np.uint32
                                            for s in sample)
    vocab = train_vocabulary(sample, k=4, L=2, seed=0)

    pf = FramePrefetcher(imgs, ext, cam, batch=4, vocab=vocab)
    f = pf.frame(2)
    want = Frame(2, imgs[2], ext, cam, vocab=vocab)
    assert f.bow is not None
    assert f.bow.keys() == want.bow.keys()
    for k in f.bow:
        assert abs(f.bow[k] - want.bow[k]) < 1e-9
    np.testing.assert_array_equal(f.feat_nodes, want.feat_nodes)


def test_prefetcher_iteration_covers_sequence(setup):
    imgs, cam, ext = setup
    pf = FramePrefetcher(imgs, ext, cam, batch=4)
    ids = [f.id for f in pf]
    assert ids == list(range(len(imgs)))
