"""Scaling-attempt cache: selection, provenance, and code-hash gating.

No Spark needed — assemble_scaling and _load_clean_cached are pure
given an attempts file.
"""

import json

import bench


def _e(pps8, pps32, clean, probe8=50.0, probe32=180.0, **kw):
    d = {"ts": "2026-08-17T00:00:00+00:00", "pps8": pps8, "pps32": pps32,
         "clean": clean, "probe8": probe8, "probe32": probe32,
         "steal": 0.001, "n_pages": 25_600_000}
    d.update(kw)
    return d


def test_clean_live_attempt_wins_over_cache():
    live = [_e(2_000_000, 6_400_000, True)]
    cached = [_e(1_000_000, 8_000_000, True)]
    out = bench.assemble_scaling(live, cached)
    # both pools are clean -> max per side across all clean attempts
    assert out["local[32]_pages_per_sec"] == 8_000_000
    assert out["clean_window"] and out["clean_window_live"]
    assert out["cached_clean_attempts_used"] == 0  # live clean exists
    assert out["efficiency"] == round(8_000_000 / 2_000_000 / 4, 3)


def test_cache_fallback_when_live_contaminated():
    live = [_e(2_200_000, 3_000_000, False)]  # weather-depressed 32-side
    cached = [_e(1_975_970, 6_534_536, True, ts="2026-08-16T10:00:00")]
    out = bench.assemble_scaling(live, cached)
    assert out["clean_window"] is True
    assert out["clean_window_live"] is False
    assert out["cached_clean_attempts_used"] == 1
    assert out["cached_attempt_ts"] == ["2026-08-16T10:00:00"]
    # numbers come from the clean cached attempt ONLY — the contaminated
    # live pair must not leak into the published throughput
    assert out["local[8]_pages_per_sec"] == 1_975_970
    assert out["local[32]_pages_per_sec"] == 6_534_536
    assert out["efficiency"] == round(6_534_536 / 1_975_970 / 4, 3)


def test_no_clean_anywhere_reports_weather_with_flag():
    live = [_e(2_000_000, 3_000_000, False)]
    out = bench.assemble_scaling(live, [])
    assert out["clean_window"] is False
    assert out["local[32]_pages_per_sec"] == 3_000_000


def test_vs_machine_caps_denominator_at_4():
    live = [_e(2_000_000, 6_000_000, True, probe8=40.0, probe32=180.0)]
    out = bench.assemble_scaling(live, [])
    # probe says 4.5x but the ideal is 4 — engine must not be inflated
    assert out["machine_speedup_8_to_32"] == 4.5
    assert out["efficiency_vs_machine"] == round(3.0 / 4.0, 3)


def test_load_clean_cached_filters_hash_pages_and_cleanliness(
        tmp_path, monkeypatch):
    path = tmp_path / "attempts.jsonl"
    rows = [
        _e(1, 4, True, pages="pages_a.parquet", code_hash="aaaa"),
        _e(1, 4, True, pages="pages_a.parquet", code_hash="bbbb"),
        _e(1, 4, False, pages="pages_a.parquet", code_hash="aaaa"),
        _e(1, 4, True, pages="pages_b.parquet", code_hash="aaaa"),
        {"skipped": True, "clean": False, "pages": "pages_a.parquet",
         "code_hash": "aaaa"},
    ]
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\nnot json\n")
    monkeypatch.setattr(bench, "ATTEMPTS_PATH", str(path))
    got = bench._load_clean_cached("pages_a.parquet", "aaaa")
    assert len(got) == 1
    assert got[0]["code_hash"] == "aaaa"
