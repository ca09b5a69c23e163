"""Pin for the committed-bench-map write guard (VERDICT r13 item 5).

BENCH_QUERIES.json is the committed sf0.1 regression-screen baseline;
bench.py used to rewrite it on EVERY run, so a smoke run at sf0.001
silently replaced the baseline with garbage (recovered by git checkout
in-session, twice). The guard routes non-protocol runs (sf != 0.1 or
runs < 2) to /tmp unless SPARK_GRAFT_BENCH_COMMIT=1.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COMMITTED = os.path.join(HERE, "BENCH_QUERIES.json")


def test_map_write_path_protocol_vs_smoke(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BENCH_COMMIT", raising=False)
    # protocol run: committed map
    assert bench._map_write_path(HERE, 0.1, 2) == COMMITTED
    assert bench._map_write_path(HERE, 0.1, 3) == COMMITTED
    # wrong SF, too few runs, or both: /tmp
    for sf_val, runs in [(0.001, 2), (0.01, 5), (0.1, 1), ("sfX", 2)]:
        assert bench._map_write_path(HERE, sf_val, runs).startswith("/tmp")
    # explicit opt-in (deliberate re-baseline) force-commits
    monkeypatch.setenv("SPARK_GRAFT_BENCH_COMMIT", "1")
    assert bench._map_write_path(HERE, 0.001, 1) == COMMITTED


def test_map_write_path_cpus_gate(monkeypatch, tmp_path):
    """VERDICT r14 item 2: a protocol-shaped run at a different core
    count (the driver's 8-core scaling pass) must NOT replace the
    committed map recorded at the protocol core count."""
    monkeypatch.delenv("SPARK_GRAFT_BENCH_COMMIT", raising=False)
    here = str(tmp_path)
    committed = os.path.join(here, "BENCH_QUERIES.json")
    # no committed map yet: any protocol run may bootstrap it
    assert bench._map_write_path(here, 0.1, 2, 8) == committed
    # committed map recorded at 32 cores: 8-core run routes to /tmp,
    # 32-core run commits
    with open(committed, "w") as fh:
        json.dump({"sf": 0.1, "cpus": 32, "queries": {}}, fh)
    assert bench._map_write_path(here, 0.1, 2, 8) == "/tmp/BENCH_QUERIES.c8.json"
    assert bench._map_write_path(here, 0.1, 2, 32) == committed
    # pre-r15 map without a cpus stamp: first protocol run stamps it
    with open(committed, "w") as fh:
        json.dump({"sf": 0.1, "queries": {}}, fh)
    assert bench._map_write_path(here, 0.1, 2, 8) == committed
    # force-commit overrides the cpus gate too (deliberate re-baseline)
    with open(committed, "w") as fh:
        json.dump({"sf": 0.1, "cpus": 32, "queries": {}}, fh)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_COMMIT", "1")
    assert bench._map_write_path(here, 0.1, 2, 8) == committed


def test_bench_cpus_reads_driver_contract(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")
    assert bench._bench_cpus() == 8
    monkeypatch.delenv("SPARK_GRAFT_CPUS", raising=False)
    assert bench._bench_cpus() == (os.cpu_count() or 8)


def test_smoke_bench_leaves_committed_map_byte_identical(
    spark, monkeypatch, tmp_path
):
    """End-to-end: a real bench.main() pass at a non-protocol SF must
    leave BENCH_QUERIES.json byte-identical and write its map to /tmp.
    The timed set is shrunk to one trivial query so the pin costs
    seconds, exercising the exact write path main() runs."""
    with open(COMMITTED, "rb") as fh:
        before = fh.read()

    class _NoStop:
        """Session proxy: main() stops its session at exit, which must
        not kill the suite's session fixture."""

        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, name):
            if name == "stop":
                return lambda: None
            return getattr(self._inner, name)

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RUNS", "1")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ROTATE_N", "0")
    monkeypatch.delenv("SPARK_GRAFT_BENCH_COMMIT", raising=False)
    monkeypatch.setattr(bench, "HEADLINE", ["q_count"])
    monkeypatch.setattr(bench, "CANARY", ["q_count"])
    monkeypatch.setattr(bench, "_landing_builders", lambda: [])
    monkeypatch.setattr(bench, "get_spark", lambda **kw: _NoStop(spark))
    smoke_path = "/tmp/BENCH_QUERIES.smoke.json"
    if os.path.exists(smoke_path):
        os.remove(smoke_path)

    bench.main()

    with open(COMMITTED, "rb") as fh:
        assert fh.read() == before
    with open(smoke_path) as fh:
        doc = json.load(fh)
    assert doc["sf"] == 0.001 and "q_count" in doc["queries"]
