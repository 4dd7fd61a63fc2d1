"""Spark-free tests for the bench scaling-pair estimator (bench._run_pair).

The pair is the recorded evidence for the north rule's two-cluster-size
criterion, so its arithmetic is pinned here with a stubbed _launch (no
subprocesses, no JVM). Round 6 (VERDICT r5 item 1): the estimator is now
ADJACENT INTERLEAVED PAIRS — reps × (N launch, 4N launch) back-to-back —
with a per-pair efficiency, a median-of-pairs headline, the full spread
recorded, and the legacy cross-matched min-run estimator kept as
``efficiency_minmatch``.
"""
import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _fake_run(secs, urls_per_sec, probe=None, **extra):
    r = {"secs": secs, "throughput_urls_per_sec": urls_per_sec,
         "candidates": 1000, "box_busy_pct": 50.0, "box_steal_pct": 0.0,
         "jobs": [{"job": 1, "wall_s": secs}]}
    if probe is not None:
        r["canon_probe_per_sec"] = probe
    r.update(extra)
    return r


def _stub_launch(monkeypatch, sides, order=None):
    """sides: {cores: [run, ...]} — each _launch(cores, k, ...) pops k runs;
    the launch order is appended to ``order`` when given."""
    def fake(cores, k, web, pair_4n, small_web):
        if order is not None:
            order.append(cores)
        return [sides[cores].pop(0) for _ in range(min(k, len(sides[cores])))]
    monkeypatch.setattr(bench, "_launch", fake)


def test_interleaved_pairs_median_and_spread(monkeypatch):
    # three adjacent pairs with per-pair effs 0.75, 0.80, 0.70
    _stub_launch(monkeypatch, {
        8: [_fake_run(200, 100_000), _fake_run(210, 95_000),
            _fake_run(190, 105_000)],
        32: [_fake_run(90, 300_000), _fake_run(85, 304_000),
             _fake_run(95, 294_000)],
    }, order := [])
    r = bench._run_pair(8, 32, "web", deadline=10_000, small_web="sw")
    # strict A/B A/B A/B interleaving, N first
    assert order == [8, 32, 8, 32, 8, 32]
    assert r["pair_efficiencies"] == [0.75, 0.8, 0.7]
    assert r["efficiency"] == 0.75          # median of pairs
    assert r["efficiency_spread"] == [0.7, 0.8]
    assert r["efficiency_spread_pct"] == pytest.approx(13.3, abs=0.1)
    # legacy estimator: best N run (190 s, 105k) vs best 4N run (85 s,
    # 304k) — cross-window matched, recorded for r3–r5 continuity only
    assert r["efficiency_minmatch"] == pytest.approx((304 / 105) / 4, abs=1e-3)
    assert r["secs_n"] == 190 and r["secs_4n"] == 85
    assert r["all_run_secs_n"] == [200, 210, 190]
    assert r["all_run_secs_4n"] == [90, 85, 95]
    assert all("box_busy_pct" in t for t in r["telemetry_4n"])
    assert r["jobs_n"] and r["jobs_4n"]


def test_per_pair_box_normalization_uses_bracketed_min(monkeypatch):
    # pair 1: N probe bracketed (pre 400k, post 380k → min 380k), 4N probe
    # 1140k → box (1140/380)/4 = 0.75; raw eff 0.75 → vs_box 1.0
    # pair 2: probes missing on the N side → that pair's vs_box is None
    _stub_launch(monkeypatch, {
        8: [_fake_run(200, 100_000, probe=400_000.0,
                      canon_probe_post_per_sec=380_000.0),
            _fake_run(200, 100_000)],
        32: [_fake_run(90, 300_000, probe=1_140_000.0),
             _fake_run(90, 300_000, probe=1_000_000.0)],
    })
    r = bench._run_pair(8, 32, "web", deadline=10_000, small_web="sw",
                        reps=2)
    assert r["pairs"][0]["box_eff"] == 0.75
    assert r["pairs"][0]["efficiency_vs_box"] == 1.0
    assert r["pairs"][1]["box_eff"] is None
    assert r["pairs"][1]["efficiency_vs_box"] is None
    # medians over the pairs that HAVE probes
    assert r["box_eff_contemporaneous"] == 0.75
    assert r["efficiency_vs_box"] == 1.0


def test_all_probes_missing_leaves_box_fields_none(monkeypatch):
    _stub_launch(monkeypatch, {
        8: [_fake_run(200, 100_000)],
        32: [_fake_run(100, 320_000)],
    })
    r = bench._run_pair(8, 32, "web", deadline=10_000, small_web="sw",
                        reps=1)
    assert r["efficiency"] == 0.8
    assert r["box_eff_contemporaneous"] is None
    assert r["efficiency_vs_box"] is None


def test_deadline_drops_later_pairs_never_the_first(monkeypatch):
    _stub_launch(monkeypatch, {
        8: [_fake_run(200, 100_000), _fake_run(150, 130_000)],
        32: [_fake_run(100, 300_000), _fake_run(80, 400_000)],
    })
    r = bench._run_pair(8, 32, "web", deadline=-1, small_web="sw")
    # only the first adjacent pair ran
    assert r["all_run_secs_n"] == [200]
    assert r["all_run_secs_4n"] == [100]
    assert r["pair_efficiencies"] == [0.75]
    assert r["efficiency"] == 0.75


def test_cpu_series_interpolation():
    # _series_at: cumulative (t, py, jvm) series, linear between samples
    series = [(0.0, 0.0, 0.0), (10.0, 5.0, 20.0), (20.0, 15.0, 30.0)]
    assert bench._series_at(series, 5.0, 1) == pytest.approx(2.5)
    assert bench._series_at(series, 15.0, 1) == pytest.approx(10.0)
    assert bench._series_at(series, 15.0, 2) == pytest.approx(25.0)
    # clamped at both ends
    assert bench._series_at(series, -5.0, 1) == 0.0
    assert bench._series_at(series, 99.0, 2) == 30.0
    assert bench._series_at([], 1.0, 1) is None


def test_proc_tree_cpu_sees_python_child():
    # spawn a child that burns ~0.3 s CPU; the tree sampler must see it
    import subprocess
    import time as _t
    before = bench._proc_tree_cpu()["py"]
    p = subprocess.Popen(
        [sys.executable, "-c",
         "import time\nt=time.process_time()\n"
         "while time.process_time()-t<0.4: pass\n"
         "time.sleep(5)"])
    try:
        deadline = _t.time() + 10
        seen = 0.0
        while _t.time() < deadline:
            seen = bench._proc_tree_cpu()["py"] - before
            if seen >= 0.3:
                break
            _t.sleep(0.2)
        assert seen >= 0.3
    finally:
        p.kill()
        p.wait()
