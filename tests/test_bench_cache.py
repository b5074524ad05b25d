"""Scaling-attempt cache: selection, provenance, and code-hash gating.

No Spark needed — assemble_scaling and _load_clean_cached are pure
given an attempts file.
"""

import json

import bench


def _e(pps8, pps32, clean, probe8=50.0, probe32=180.0, **kw):
    # when clean=True, carry the full field set the round-4 recomputed
    # criterion (_attempt_clean) checks; when False, fail its probes
    d = {"ts": "2026-08-17T00:00:00+00:00", "pps8": pps8, "pps32": pps32,
         "clean": clean, "probe8": probe8, "probe32": probe32,
         "steal": 0.001, "n_pages": 25_600_000,
         "pre_good": clean, "mid_good": clean, "boost8": 1.02,
         # mid 8-way probe at the controlled operating point: per-proc
         # ratio (45/8)/(180/32) = 1.0, inside [BOOST_MIN, BOOST_MAX]
         "p32_ref": 180.0, "mid_probe": [0.001, 45.0, 160.0],
         "steal_iter": 0.001, "foreign_iter": 0.0,
         "eff_raw": min(round(pps32 / pps8 / 4, 3), 1.0) if pps8 else 0.0}
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
    # supplementary paired measurement: the single clean attempt with
    # the highest per-attempt efficiency (8M/1M/4 = 2.0 -> capped at
    # 1.0 by _e; still the max)
    best = out["best_clean_attempt"]
    assert best["pps8"] == 1_000_000 and best["pps32"] == 8_000_000
    # pooled efficiency is never above the best single attempt's
    assert out["efficiency"] <= best["eff_raw"]


def test_no_clean_attempts_has_no_best_attempt():
    out = bench.assemble_scaling([_e(2_000_000, 3_000_000, False)], [])
    assert out["best_clean_attempt"] is None


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


def test_attempt_clean_recomputed_criterion():
    base = _e(2_000_000, 6_400_000, True)
    assert bench._attempt_clean(base)
    # records predating the operating-point guard (no boost8) never
    # qualify — their 8-side may have run on boosted-idle cores
    old = dict(base)
    del old["boost8"]
    assert not bench._attempt_clean(old)
    # boosted published iteration -> denominator on overclocked cores
    assert not bench._attempt_clean({**base, "boost8": 1.6})
    # super-linear raw efficiency is itself evidence of a depressed
    # denominator; the cap only discards too-GOOD readings
    assert not bench._attempt_clean({**base, "eff_raw": 1.4})
    # iteration-level contamination gates
    assert not bench._attempt_clean({**base, "steal_iter": 0.05})
    assert not bench._attempt_clean({**base, "foreign_iter": 0.10})
    # 8-side bracketing probes are required; post is context only
    assert bench._attempt_clean({**base, "post_good": False})
    assert not bench._attempt_clean({**base, "skipped": True})
    # below-band published iteration -> depressed denominator, the
    # direction that INFLATES efficiency
    assert not bench._attempt_clean({**base, "boost8": 0.8})


def test_attempt_clean_mid_bracket_fairness():
    base = _e(2_000_000, 6_400_000, True)
    # mid bracket certifies the 8-SIDE: its 8-way probe must sit in the
    # operating-point band vs the attempt's 32-busy reference
    assert not bench._attempt_clean(
        {**base, "mid_probe": [0.001, 20.0, 160.0]})   # throttled tail
    assert not bench._attempt_clean(
        {**base, "mid_probe": [0.001, 75.0, 160.0]})   # boosted tail
    assert not bench._attempt_clean(
        {**base, "mid_probe": [0.05, 45.0, 160.0]})    # steal burst
    # ... but its 32-way component is NOT gating: a grant dip there can
    # only depress the upcoming 32-side (conservative direction). This
    # is the shape of the real attempt at 2026-08-17T22:51:38Z (boost8
    # 0.909, mid p8 37.1 vs pre probe32 154.5 -> ratio 0.96, mid p32
    # dipped to 106) that the old full-window mid gate rejected.
    assert bench._attempt_clean({**base, "mid_probe": [0.001, 45.0, 90.0],
                                 "mid_good": False})
    # records predating mid_probe absolutes cannot be certified
    nomid = dict(base)
    del nomid["mid_probe"]
    assert not bench._attempt_clean(nomid)
    # fallback reference: attempts that predate p32_ref use probe32 (a
    # max with the post reading — can only reject, never admit)
    nopref = dict(base)
    del nopref["p32_ref"]
    assert bench._attempt_clean(nopref)
