"""Unit pins for bench.py's fresh-subprocess panel selection.

The fresh panel is the round-over-round perf signal, and its selection
logic has needed two behavioral fixes in two rounds (r7 ADVICE: silent
failure modes; r8 battery: prior-panel names silently dropped when they
fell out of the isolated top-50). These tests pin the three contracts
without spawning Spark: panel composition, fresh-vs-fresh mover
baseline, and loud failure reporting.
"""

from __future__ import annotations

import json
import subprocess

import pytest

import bench
from aws_glue_pyspark_incrementality_and_parallelism_spark.plans.catalog import REGISTRY

# real registry names (the panel filters against catalog.REGISTRY)
_NAMES = sorted(REGISTRY)[:8]


def _write_prior(tmp_path, *, isolated, isolated_fresh=None, sf=0.1, rnd=7):
    detail = {"sf": sf, "isolated": isolated, "isolated_fresh": isolated_fresh or {}}
    (tmp_path / f"BENCH_DETAIL_r{rnd:02d}.json").write_text(json.dumps(detail))


@pytest.fixture()
def repo_root(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_REPO_ROOT", str(tmp_path))
    return tmp_path


def _capture_subprocess(monkeypatch, captured, stdout="FRESH_JSON:{}", rc=0, stderr=""):
    def fake_run(argv, **kw):
        # argv = [python, -c, prog, sf_dir, comma-joined-names]
        captured["names"] = argv[4].split(",")

        class R:
            returncode = rc

        R.stdout = stdout
        R.stderr = stderr
        return R

    monkeypatch.setattr(subprocess, "run", fake_run)


def test_prior_fresh_panel_remeasured_even_outside_isolated_top50(repo_root, monkeypatch):
    """Every name in the previous round's fresh panel is re-timed even
    when it is absent from this round's isolated column (the r8 battery
    found 4 panel names silently dropped by an `in isolated` guard)."""
    a, b, c = _NAMES[:3]
    _write_prior(repo_root, isolated={a: 1.0}, isolated_fresh={a: 1.0, b: 2.0, c: 3.0})
    captured = {}
    _capture_subprocess(
        monkeypatch, captured, stdout=f'FRESH_JSON:{json.dumps({a: 1.0})}'
    )
    fresh, err = bench._fresh_isolated_movers({a: 1.0}, "/tmp/sf", 8, 0.1)
    assert err is None
    assert set(captured["names"]) >= {a, b, c}, "prior fresh panel not fully re-measured"


def test_unregistered_prior_panel_names_are_skipped(repo_root, monkeypatch):
    a = _NAMES[0]
    _write_prior(repo_root, isolated={a: 1.0}, isolated_fresh={a: 1.0, "gone_query": 9.9})
    captured = {}
    _capture_subprocess(monkeypatch, captured)
    bench._fresh_isolated_movers({a: 1.0}, "/tmp/sf", 8, 0.1)
    assert "gone_query" not in captured["names"]


def test_movers_judged_fresh_vs_fresh_when_prior_fresh_exists(repo_root, monkeypatch):
    """A query whose in-session isolated number moved >1.3x vs the prior
    IN-SESSION column but is flat vs the prior FRESH reading must be
    judged against the fresh reading (no false mover)."""
    a, b = _NAMES[:2]
    # a: prior in-session 10.0 but prior fresh 5.0; current 5.0 -> flat fresh-vs-fresh
    # b: no prior fresh; current 4.0 vs prior 1.0 -> true mover
    _write_prior(repo_root, isolated={a: 10.0, b: 1.0}, isolated_fresh={a: 5.0})
    captured = {}
    _capture_subprocess(monkeypatch, captured)
    bench._fresh_isolated_movers({a: 5.0, b: 4.0}, "/tmp/sf", 8, 0.1)
    # both end up in the panel (a via the prior-fresh re-measure rule),
    # but only b crosses the mover threshold: check ordering — movers
    # lead the name list, so b must appear before a.
    names = captured["names"]
    assert names.index(b) < names.index(a)


def test_failure_is_reported_not_swallowed(repo_root, monkeypatch):
    """A crashed fresh subprocess (no FRESH_JSON line) returns an error
    string carrying the returncode and stderr tail — never a silent {}
    (r7 ADVICE), and the caller records it in BENCH_DETAIL."""
    a = _NAMES[0]
    _write_prior(repo_root, isolated={a: 1.0}, isolated_fresh={a: 1.0})
    captured = {}
    _capture_subprocess(
        monkeypatch, captured, stdout="", rc=137, stderr="x\ny\njava.lang.OutOfMemoryError"
    )
    fresh, err = bench._fresh_isolated_movers({a: 5.0}, "/tmp/sf", 8, 0.1)
    assert fresh == {}
    assert err is not None and "rc=137" in err and "OutOfMemoryError" in err


def test_no_prior_detail_is_a_clean_noop(repo_root):
    fresh, err = bench._fresh_isolated_movers({_NAMES[0]: 1.0}, "/tmp/sf", 8, 0.1)
    assert (fresh, err) == ({}, None)


def test_different_sf_prior_is_ignored(repo_root, monkeypatch):
    a = _NAMES[0]
    _write_prior(repo_root, isolated={a: 1.0}, isolated_fresh={a: 1.0}, sf=0.001)
    fresh, err = bench._fresh_isolated_movers({a: 9.0}, "/tmp/sf", 8, 0.1)
    assert (fresh, err) == ({}, None)
