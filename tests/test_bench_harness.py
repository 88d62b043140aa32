"""The bench harness contract: the record must survive truncation.

The driver captures only the last ~2000 characters of stdout and parses
a JSON line from them (rounds 3 and 4 both lost their perf records to
this).  These tests pin the harness invariants without touching a
device: compact projections stay small, the merged line stays under the
tail cap even with every section populated, and the emergency slim-down
path keeps the required metric fields.
"""

import json

import bench


FULL_SECTIONS = {
    "e2e": {
        "fps_warm": 16.89, "fps_cold": 2.41, "rotation_rmse_deg": 0.7231,
        "rotation_rmse_deg_noloop": 5.8213, "loop_gain": 8.05,
        "loop_edges": 87, "vocab_words": 100000,
    },
    "incremental": {
        "fps": 1.95, "fps_steady": 13.75, "rotation_rmse_deg": 0.0692,
        "loop_edges": 3, "rotavg_ms_p50": 1.0, "vocab_words": 100000,
    },
    "windows": {
        "windows_per_s": 1413.8, "vs_oracle": 37.1,
        "mean_err_vs_gt_deg": 1.803, "chol_knee_W": 24576,
        "chol_knee_solves_per_s": 562067.0,
    },
    "vocab": {
        "production_scale": {"n_words": 10 ** 6, "text_mb": 144.3,
                             "native_parse_s": 0.68},
        "transform_desc_per_s": 362988.0, "cascade_query_ms": 6.14,
    },
    "large": {
        "n_views": 50000, "solve_s": 12.583, "converged": True,
        "mean_err_vs_gt_deg": 3.771,
    },
    "scaling": {
        "by_size": {
            "20k": {"by_devices": {"8": {"work_conservation": 0.775}}},
            "50k": {"by_devices": {"8": {"work_conservation": 0.735}}},
        },
    },
}


def test_compact_projections_cover_every_section():
    for name, full in FULL_SECTIONS.items():
        comp = bench._compact_of(name, full)
        assert comp, f"empty compact projection for {name}"
        # compact values must be scalars (JSON-small), not nested blobs
        for v in comp.values():
            assert not isinstance(v, (dict, list)), (name, v)


def test_compact_projections_pass_through_errors():
    assert bench._compact_of("e2e", {"error": "X"}) == {"error": "X"}
    assert bench._compact_of("large", {"skipped": "budget"}) == {
        "skipped": "budget"}


def test_merged_line_fits_the_driver_tail_cap():
    compact = {
        "metric": "batch_ravg_solve_ms_m3655_n1832", "unit": "ms",
        "platform": "tpu", "budget_s": 900.0, "detail": "BENCH_FULL.json",
        "skipped": [], "value": 11.55, "vs_baseline": 2.288,
        "quality_ok": True, "elapsed_s": 622.8,
        "sections": {n: bench._compact_of(n, f)
                     for n, f in FULL_SECTIONS.items()},
    }
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) < 1800, len(line)
    # and it round-trips with the required metric fields present
    parsed = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in parsed


def test_emit_slims_oversized_lines(tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(bench, "FULL_PATH", str(tmp_path / "full.json"))
    monkeypatch.setitem(bench._COMPACT, "metric", "m")
    monkeypatch.setitem(bench._COMPACT, "value", 1.0)
    monkeypatch.setitem(bench._COMPACT, "unit", "ms")
    monkeypatch.setitem(bench._COMPACT, "vs_baseline", 2.0)
    # oversized junk that must be slimmed away
    monkeypatch.setitem(bench._COMPACT, "sections", {"x": "y" * 4000})
    bench._FULL["sections"] = {"x": "big"}
    bench._emit()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(out) < 2000
    parsed = json.loads(out)
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in parsed
    # the full-detail file was still written
    assert (tmp_path / "full.json").exists()
    bench._COMPACT.pop("sections", None)
    bench._FULL.pop("sections", None)
