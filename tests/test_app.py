"""Application shell tests: config loader, sequence loader, both CLIs."""

import os
import subprocess
import sys

import numpy as np
import pytest

from irotavg_tpu.config import (
    PipelineConfig, load_settings, read_opencv_yaml,
)
from irotavg_tpu.utils.sequence import SequenceLoader

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# vendored copy of the reference's bundled problem (ral/data/ravg_input.txt:1)
RAVG_INPUT = os.path.join(REPO, "tests", "data", "ravg_input.txt.gz")

KITTI_YAML = """\
%YAML:1.0

# Camera Parameters. Adjusted by ORB-SLAM authors.
Camera.fx: 718.856
Camera.fy: 718.856
Camera.cx: 607.1928
Camera.cy: 185.2157

Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0

# ORB Extractor
ORBextractor.nFeatures: 2000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


def test_opencv_yaml_reader(tmp_path):
    p = tmp_path / "kitti.yaml"
    p.write_text(KITTI_YAML)
    s = read_opencv_yaml(str(p))
    assert s["Camera.fx"] == pytest.approx(718.856)
    assert s["ORBextractor.nFeatures"] == 2000
    assert isinstance(s["ORBextractor.nFeatures"], int)
    assert s["ORBextractor.scaleFactor"] == pytest.approx(1.2)


def test_load_settings(tmp_path):
    p = tmp_path / "kitti.yaml"
    p.write_text(KITTI_YAML)
    cam, orb = load_settings(str(p))
    assert cam.cx == pytest.approx(607.1928)
    assert cam.k1 == 0.0
    assert orb.n_levels == 8 and orb.ini_th_fast == 20


def test_pipeline_config_defaults():
    cfg = PipelineConfig()
    # the reference's hard-coded constants (src/IRotAvg.cpp:158-161, etc.)
    assert cfg.vg_win_size == 4
    assert cfg.rotavg_win_size == 10
    assert cfg.vg_min_matches == 100
    assert cfg.loop.min_matches == 150
    assert cfg.loop.covisibility_consistency_th == 7
    assert cfg.matching.th_low == 50
    assert cfg.solver.sigma_deg == 5.0


def test_sequence_loader_sorts_by_timestamp(tmp_path):
    for name in ["000002.png", "000000.png", "000001.png", "skipme.jpg"]:
        (tmp_path / name).write_bytes(b"x")
    sl = SequenceLoader(str(tmp_path), ".png")
    assert len(sl) == 3
    assert [t for t, _ in sl] == [0, 1, 2]


def test_sequence_loader_timestamp_offset(tmp_path):
    (tmp_path / "cam144_2.tif").write_bytes(b"x")
    (tmp_path / "cam144_10.tif").write_bytes(b"x")
    sl = SequenceLoader(str(tmp_path), ".tif", timestamp_offset=7)
    assert [t for t, _ in sl] == [2, 10]


def _run(cmd, **kw):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return subprocess.run(cmd, capture_output=True, text=True, env=env,
                          cwd=REPO, timeout=600, **kw)


@pytest.mark.skipif(not os.path.exists(RAVG_INPUT),
                    reason="reference problem file not present")
def test_l1_irls_cli(tmp_path):
    out = tmp_path / "out.txt"
    r = _run([sys.executable, "-m", "irotavg_tpu.app.l1_irls",
              RAVG_INPUT, str(out)])
    assert r.returncode == 0, r.stderr
    assert "total runtime" in r.stdout
    lines = out.read_text().strip().splitlines()
    # n=1832 rotation rows + m=3655 weight rows (ral/test.cpp:314-326)
    assert len(lines) == 1832 + 3655
    Q = np.array([[float(v) for v in ln.split()] for ln in lines[:1832]])
    assert Q.shape == (1832, 4)
    np.testing.assert_allclose(np.linalg.norm(Q, axis=1), 1.0, atol=1e-9)
    w = np.array([float(v) for v in lines[1832:]])
    assert np.all(w >= 0) and np.all(w <= 1e4)


@pytest.mark.perf
def test_irotavg_cli_end_to_end(tmp_path):
    """Full SLAM CLI over a synthetic image sequence.

    perf-marked: the subprocess runs the whole pipeline under a 600 s
    deadline — comfortably met serially (~250 s) but not with N xdist
    workers contending for the cores."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from seqgen import make_sequence
    from PIL import Image

    frames, K, _ = make_sequence(n_frames=6, seed=3, step=0.3,
                                 yaw_deg_per_frame=-1.0)
    seq = tmp_path / "seq"
    seq.mkdir()
    for i, im in enumerate(frames):
        Image.fromarray(im).save(seq / f"{i:06d}.png")

    yaml = tmp_path / "cam.yaml"
    yaml.write_text(
        "%YAML:1.0\n"
        f"Camera.fx: {K[0, 0]}\nCamera.fy: {K[1, 1]}\n"
        f"Camera.cx: {K[0, 2]}\nCamera.cy: {K[1, 2]}\n"
        "Camera.k1: 0.0\nCamera.k2: 0.0\nCamera.p1: 0.0\nCamera.p2: 0.0\n"
        "ORBextractor.nFeatures: 1200\nORBextractor.scaleFactor: 1.2\n"
        "ORBextractor.nLevels: 8\nORBextractor.iniThFAST: 20\n"
        "ORBextractor.minThFAST: 7\n"
    )
    out = tmp_path / "out"
    r = _run([sys.executable, "-m", "irotavg_tpu.app.irotavg",
              "none", str(yaml), str(seq),
              "--out_dir", str(out)])
    assert r.returncode == 0, r.stderr[-2000:]
    poses = (out / "rotavg_poses.txt").read_text().strip().splitlines()
    ids = (out / "rotavg_poses_ids.txt").read_text().strip().splitlines()
    assert len(poses) >= 4 and len(ids) == len(poses)
    row = poses[0].split("\t")
    assert len(row) == 8                      # id + q(4) + t(3)
    assert [float(v) for v in row[5:]] == [0.0, 0.0, 0.0]  # zero translations
    q = np.array([float(v) for v in row[1:5]])
    assert np.linalg.norm(q) == pytest.approx(1.0, abs=1e-6)
    assert "runtimes" in r.stdout
