"""Spark-free tests for the bench scaling-pair estimator (bench._run_pair).

The pair is the recorded evidence for the north rule's two-cluster-size
criterion, so its arithmetic — min-run selection, efficiency, and the
round-5 contemporaneous box-probe normalization — is pinned here with a
stubbed _launch (no subprocesses, no JVM).
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


def _stub_launch(monkeypatch, sides):
    """sides: {cores: [run, ...]} — each _launch(cores, k, ...) pops k runs."""
    def fake(cores, k, web, pair_4n, small_web):
        out = [sides[cores].pop(0) for _ in range(min(k, len(sides[cores])))]
        return out
    monkeypatch.setattr(bench, "_launch", fake)


def test_min_run_efficiency_and_box_normalization(monkeypatch):
    # N=8 side: min secs 200 @ 100k urls/s, probe 400k
    # 4N=32 side: min secs 90 @ 300k urls/s, probe 1200k
    _stub_launch(monkeypatch, {
        8: [_fake_run(230, 90_000, probe=410_000.0),
            _fake_run(200, 100_000, probe=400_000.0)],
        32: [_fake_run(120, 250_000, probe=1_100_000.0),
             _fake_run(90, 300_000, probe=1_200_000.0),
             _fake_run(95, 280_000, probe=1_150_000.0)],
    })
    r = bench._run_pair(8, 32, "web", deadline=10_000, small_web="sw")
    assert r["secs_n"] == 200 and r["secs_4n"] == 90
    # eff = (300k/100k)/4 = 0.75, from the MIN run of each side
    assert r["efficiency"] == 0.75
    # box ratio from the MIN runs' probes: (1200k/400k)/4 = 0.75
    assert r["box_eff_contemporaneous"] == 0.75
    assert r["efficiency_vs_box"] == 1.0
    assert r["canon_probe_n"] == 400_000.0
    assert r["canon_probe_4n"] == 1_200_000.0
    # every run's secs and telemetry are recorded, not just the min
    assert r["all_run_secs_n"] == [230, 200]
    assert r["all_run_secs_4n"] == [120, 90, 95]
    assert all("box_busy_pct" in t for t in r["telemetry_4n"])
    # min run's job profile rides along for stage attribution
    assert r["jobs_n"] and r["jobs_4n"]


def test_post_probe_min_catches_mid_launch_degradation(monkeypatch):
    # the 4N launch's box degraded AFTER its pre-probe (pre 1600k, post
    # 1200k): the referee must use the MIN, crediting the box with only
    # what it could still do during the timed window
    _stub_launch(monkeypatch, {
        8: [_fake_run(200, 100_000, probe=400_000.0,
                      canon_probe_post_per_sec=410_000.0)],
        32: [_fake_run(90, 300_000, probe=1_600_000.0,
                       canon_probe_post_per_sec=1_200_000.0),
             _fake_run(95, 280_000, probe=1_600_000.0,
                       canon_probe_post_per_sec=1_200_000.0)],
    })
    r = bench._run_pair(8, 32, "web", deadline=10_000, small_web="sw")
    # N side: min(400k, 410k) = 400k; 4N side: min(1600k, 1200k) = 1200k
    assert r["canon_probe_n"] == 400_000.0
    assert r["canon_probe_4n"] == 1_200_000.0
    assert r["box_eff_contemporaneous"] == 0.75  # (1200/400)/4
    # both probes visible per run for the reader
    assert r["telemetry_4n"][0]["canon_probe_per_sec"] == 1_600_000.0
    assert r["telemetry_4n"][0]["canon_probe_post_per_sec"] == 1_200_000.0


def test_missing_probe_leaves_box_fields_none(monkeypatch):
    # a launch where the probe import failed (canon_rate None) must not
    # break the pair — raw efficiency recorded, normalized fields None
    _stub_launch(monkeypatch, {
        8: [_fake_run(200, 100_000)],
        32: [_fake_run(100, 320_000, probe=1_000_000.0),
             _fake_run(100, 320_000, probe=1_000_000.0)],
    })
    r = bench._run_pair(8, 32, "web", deadline=10_000, small_web="sw")
    assert r["efficiency"] == 0.8
    assert r["box_eff_contemporaneous"] is None
    assert r["efficiency_vs_box"] is None


def test_deadline_drops_second_round_only(monkeypatch):
    # deadline already exceeded after the first two schedule items: the
    # guard must still run them (one 2-run 4N launch + one N launch) and
    # drop only the second round
    _stub_launch(monkeypatch, {
        8: [_fake_run(200, 100_000, probe=1.0),
            _fake_run(150, 130_000, probe=1.0)],
        32: [_fake_run(100, 300_000, probe=3.0),
             _fake_run(95, 310_000, probe=3.0),
             _fake_run(80, 400_000, probe=3.0)],
    })
    r = bench._run_pair(8, 32, "web", deadline=-1, small_web="sw")
    assert r["all_run_secs_4n"] == [100, 95]  # first launch only (k=2)
    assert r["all_run_secs_n"] == [200]       # first N launch only
    assert r["efficiency"] == pytest.approx((310_000 / 100_000) / 4)
