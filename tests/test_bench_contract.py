"""Contract gates for bench.py — the per-round perf artifact.

The driver consumes bench.py's one JSON line; BASELINE.md comparability
depends on the frozen HEADLINE set and the run-1 semantics, and the r8
self-attribution depends on the telemetry sampler never breaking the
one-line contract (it must degrade to an empty dict, not raise, on a
host without /proc)."""

import bench

from auto_vectordb_spark.plans.parity import REGISTRY


def test_headline_queries_are_registered():
    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, f"HEADLINE names not in REGISTRY: {missing}"


def test_headline_set_is_frozen():
    # cross-round comparability: BASELINE.md and BENCH_r* all speak this
    # exact 14-query dialect — additions belong in a NEW metric, not here
    assert len(bench.HEADLINE) == 14
    assert bench.HEADLINE[0] == "q1_pricing_summary"


def test_host_telemetry_shape():
    t = bench._host_telemetry()
    # on this CI host /proc exists; both fields must parse
    assert len(t["loadavg"]) == 3
    assert all(isinstance(x, float) for x in t["loadavg"])
    assert isinstance(t["mem_available_kb"], int) and t["mem_available_kb"] > 0


def test_host_telemetry_degrades_without_proc(monkeypatch):
    import builtins

    real_open = builtins.open

    def no_proc(path, *a, **k):
        if str(path).startswith("/proc/"):
            raise OSError("no proc here")
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", no_proc)
    assert bench._host_telemetry() == {}
