"""Tests for match visualisation and view-graph serialisation."""

import numpy as np

from irotavg_tpu.utils.viz import draw_matches, plot_matches, save_png


def test_draw_matches_canvas_layout():
    im1 = np.zeros((48, 64), np.uint8)
    im2 = np.full((32, 80), 200, np.uint8)
    xy1 = np.array([[10.0, 10.0], [50.0, 40.0]])
    xy2 = np.array([[5.0, 5.0], [70.0, 20.0]])
    pairs = np.array([[0, 1], [1, 0]])
    canvas = draw_matches(im1, xy1, im2, xy2, pairs)
    assert canvas.shape == (48, 144, 3)
    assert canvas.dtype == np.uint8
    # right half carries im2's background level (where not drawn over)
    assert (canvas[:32, 64:] == 200).all(axis=-1).mean() > 0.8
    # lines drawn: some pixels are neither 0 nor 200 in each half
    left = canvas[:, :64].reshape(-1, 3)
    right = canvas[:, 64:].reshape(-1, 3)
    assert ((left != 0).any(axis=1)).sum() > 10
    assert ((right != 200).any(axis=1) & (right != 0).any(axis=1)).sum() > 10


def test_draw_matches_caps_lines():
    im = np.zeros((16, 16), np.uint8)
    xy = np.random.default_rng(0).uniform(0, 15, size=(1000, 2))
    pairs = np.stack([np.arange(1000), np.arange(1000)], axis=1)
    canvas = draw_matches(im, xy, im, xy, pairs, max_lines=10)
    assert canvas.shape == (16, 32, 3)


def test_plot_matches_roundtrip(tmp_path):
    class F:
        pass

    f1, f2 = F(), F()
    f1.image = np.zeros((24, 24), np.uint8)
    f2.image = np.zeros((24, 24), np.uint8)
    f1.x = np.array([3.0, 20.0]); f1.y = np.array([3.0, 20.0])
    f2.x = np.array([4.0, 21.0]); f2.y = np.array([5.0, 19.0])
    path = str(tmp_path / "m.png")
    canvas = plot_matches(f1, f2, np.array([[0, 0], [1, 1]]), path)
    from PIL import Image

    back = np.asarray(Image.open(path))
    np.testing.assert_array_equal(back, canvas)


def test_plot_matches_requires_image():
    class F:
        image = None

    import pytest

    with pytest.raises(ValueError):
        plot_matches(F(), F(), np.zeros((0, 2), int))


def test_save_view_graph_yaml(tmp_path):
    """save_view_graph writes one record per connection (i < j) with the
    relative R and t (parity: src/ViewGraph.cpp:1148-1171)."""
    from irotavg_tpu.engine.viewgraph import Connection, ViewGraph
    from irotavg_tpu.geometry.twoview import RelativePose

    vg = ViewGraph.__new__(ViewGraph)
    vg.connections = {}
    vg.frames = []

    class FakeFrame:
        def __init__(self, fid):
            self.id = fid

    vg.frames = [FakeFrame(7), FakeFrame(9), FakeFrame(12)]
    R01 = np.eye(3)
    t01 = np.array([0.0, 0.0, 1.0])
    R12 = np.diag([1.0, -1.0, -1.0])
    t12 = np.array([0.5, 0.0, 0.5])
    for (i, j), (R, t) in {(0, 1): (R01, t01), (1, 2): (R12, t12)}.items():
        vg.connections[(i, j)] = Connection(
            pairs=np.zeros((0, 2), np.int32),
            pose=RelativePose(R=R, t=t, E=np.eye(3), n_cheirality=0,
                              inlier_mask=np.ones(0, bool)),
        )
    path = str(tmp_path / "vg.yaml")
    vg.save_view_graph(path)
    text = open(path).read()
    assert text.startswith("%YAML:1.0")
    assert "i: 7, j: 9" in text
    assert "i: 9, j: 12" in text
    # R of the second edge round-trips
    row = [ln for ln in text.splitlines() if "R:" in ln][1]
    vals = [float(v) for v in row.split("[")[1].split("]")[0].split(",")]
    np.testing.assert_allclose(np.array(vals).reshape(3, 3), R12)


def test_incidence_fixed_complement():
    """A@x_free + C@x_fixed == x[j] - x[i] on real edges (make_C parity,
    ral/l1_irls.cpp:783-806)."""
    import jax.numpy as jnp

    from irotavg_tpu.solver.graph import (
        incidence_fixed_matvec, incidence_matvec,
    )

    rng = np.random.default_rng(3)
    n, m, f = 7, 12, 3
    edges = jnp.asarray(rng.integers(0, n, size=(m, 2)), jnp.int32)
    x = jnp.asarray(rng.normal(size=(n, 3)))
    free = jnp.arange(n) >= f
    emask = jnp.asarray(rng.random(m) > 0.2)
    a = incidence_matvec(edges, x, free, emask)
    c = incidence_fixed_matvec(edges, x, free, emask)
    full = np.where(np.asarray(emask)[:, None],
                    np.asarray(x)[np.asarray(edges)[:, 1]]
                    - np.asarray(x)[np.asarray(edges)[:, 0]], 0.0)
    np.testing.assert_allclose(np.asarray(a + c), full, atol=1e-12)
