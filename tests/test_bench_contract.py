"""Contract gates for bench.py — the per-round perf artifact.

The driver consumes bench.py's FINAL stdout line via a 2,000-char tail
capture; BASELINE.md comparability depends on the frozen HEADLINE set and
the run-1 semantics, the r8 self-attribution depends on the telemetry
sampler never breaking the line contract (degrade to an empty dict, not
raise, on a host without /proc), and — the r8 lesson, BENCH_r08
``parsed: null`` — the final line must FIT the capture window, so
runs_detail lives in a sidecar and the compact line is length-gated."""

import json
import os

import bench
import pytest

from auto_vectordb_spark.plans.parity import REGISTRY


def test_headline_queries_are_registered():
    missing = [
        n for n in [*bench.HEADLINE, *bench.HEADLINE_V2] if n not in REGISTRY
    ]
    assert not missing, f"HEADLINE names not in REGISTRY: {missing}"


def test_headline_set_is_frozen():
    # cross-round comparability: BASELINE.md and BENCH_r* all speak this
    # exact 14-query dialect — additions belong in a NEW metric, not here
    assert len(bench.HEADLINE) == 14
    assert bench.HEADLINE[0] == "q1_pricing_summary"
    # the r12 modern-family suite is frozen the same way, on its own channel
    assert len(bench.HEADLINE_V2) == 8
    assert bench.HEADLINE_V2[0] == "zorder_compaction_apply"


@pytest.mark.skipif(
    not os.path.exists("/proc/loadavg"), reason="telemetry shape needs /proc"
)
def test_host_telemetry_shape():
    t = bench._host_telemetry()
    assert len(t["loadavg"]) == 3
    assert all(isinstance(x, float) for x in t["loadavg"])
    assert isinstance(t["mem_available_kb"], int) and t["mem_available_kb"] > 0


def test_host_telemetry_loadavg_all_or_nothing(monkeypatch):
    # a malformed short /proc/loadavg must omit the key entirely, never
    # emit a <3-element list that IndexErrors consumers indexing [0..2]
    import builtins
    import io

    real_open = builtins.open

    def short_loadavg(path, *a, **k):
        if str(path) == "/proc/loadavg":
            return io.StringIO("1.23")
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", short_loadavg)
    assert "loadavg" not in bench._host_telemetry()


def _worst_case_runs(n_repeats: int = 3):
    # 5-digit-seconds timings (unrealistically slow) stress the serialized width
    return (
        [{name: 86400.123 + i for name in bench.HEADLINE} for i in range(n_repeats)],
        [{name: 86400.123 + i for name in bench.HEADLINE_V2} for i in range(n_repeats)],
    )


def test_final_line_fits_driver_capture_window():
    line = json.dumps(bench._compact_payload(*_worst_case_runs(), sf=0.1))
    assert len(line) <= bench.MAX_FINAL_LINE, (
        f"{len(line)} chars — the driver tail-captures 2,000; BENCH would be parsed:null"
    )


def test_compact_payload_has_frozen_keys_and_no_detail():
    p = bench._compact_payload(*_worst_case_runs(), sf=0.1)
    assert set(p) == {
        "metric", "value", "unit", "value_convention", "queries",
        "value_run1", "queries_run1", "runs",
        "value_v2", "queries_v2", "runs_v2", "sf",
    }
    assert "runs_detail" not in p


def test_value_is_median_channel_and_run1_is_preserved():
    """Round-11 convention: the driver-facing ``value``/``queries`` are the
    per-query medians; the r1-r10 run-1 semantics live on verbatim as
    ``value_run1``/``queries_run1`` (BASELINE.md documents both)."""
    runs = [
        {name: 1.0 for name in bench.HEADLINE},
        {name: 5.0 for name in bench.HEADLINE},  # noisy middle repeat
        {name: 1.2 for name in bench.HEADLINE},
    ]
    runs_v2 = [
        {name: 2.0 for name in bench.HEADLINE_V2},
        {name: 9.0 for name in bench.HEADLINE_V2},
        {name: 2.4 for name in bench.HEADLINE_V2},
    ]
    p = bench._compact_payload(runs, runs_v2, sf=0.1)
    n = len(bench.HEADLINE)
    assert p["value"] == round(1.2 * n, 3)  # sum of per-query medians
    assert p["queries"] == {name: 1.2 for name in bench.HEADLINE}
    assert p["value_run1"] == round(1.0 * n, 3)
    assert p["queries_run1"] == runs[0]
    assert p["value_convention"] == "median"
    # v2 channel: same median statistic, legacy channels untouched by it
    assert p["value_v2"] == round(2.4 * len(bench.HEADLINE_V2), 3)
    assert p["queries_v2"] == {name: 2.4 for name in bench.HEADLINE_V2}
    # single-repeat invocation (the A/B child mode): median == run-1
    p1 = bench._compact_payload(runs[:1], runs_v2[:1], sf=0.1)
    assert p1["value"] == p1["value_run1"]


def test_emit_prints_compact_last_and_sidecars_detail(tmp_path, capsys, monkeypatch):
    sidecar = tmp_path / "detail.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAIL", str(sidecar))
    compact = bench._compact_payload(*_worst_case_runs(), sf=0.01)
    detail = {"metric": "headline_suite_detail", "runs_detail": [{"pre": {}}], "sf": 0.01}
    bench._emit(compact, detail)
    out_lines = capsys.readouterr().out.strip().splitlines()
    # final stdout line IS the compact payload — nothing printed after it
    assert json.loads(out_lines[-1]) == compact
    assert json.loads(sidecar.read_text()) == detail


def test_emit_falls_back_to_stdout_when_sidecar_unwritable(tmp_path, capsys, monkeypatch):
    monkeypatch.setenv(
        "SPARK_GRAFT_BENCH_DETAIL", str(tmp_path / "no_dir" / "detail.json")
    )
    compact = bench._compact_payload(*_worst_case_runs(1), sf=0.01)
    detail = {"metric": "headline_suite_detail", "runs_detail": [], "sf": 0.01}
    bench._emit(compact, detail)
    out_lines = capsys.readouterr().out.strip().splitlines()
    # detail printed EARLIER (truncation-safe position), compact still last
    assert json.loads(out_lines[0]) == detail
    assert json.loads(out_lines[-1]) == compact


def test_host_telemetry_degrades_without_proc(monkeypatch):
    import builtins

    real_open = builtins.open

    def no_proc(path, *a, **k):
        if str(path).startswith("/proc/"):
            raise OSError("no proc here")
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", no_proc)
    assert bench._host_telemetry() == {}


def test_parse_bench_stdout_takes_last_value_line():
    """The A/B child parser must survive warn noise, earlier detail lines
    (old rounds printed detail to stdout), and progress bars — taking the
    LAST JSON object carrying the frozen 'value' key."""
    out = "\n".join(
        [
            "26/08/16 WARN NativeCodeLoader: ...",
            json.dumps({"metric": "headline_suite_detail", "runs_detail": []}),
            json.dumps({"metric": "headline_suite_total", "value": 9.1, "queries": {"q1": 1.0}}),
            json.dumps({"metric": "headline_suite_total", "value": 8.2, "queries": {"q1": 0.9}}),
            "",
        ]
    )
    got = bench._parse_bench_stdout(out)
    assert got is not None and got["value"] == 8.2
    assert bench._parse_bench_stdout("no json at all\n") is None


def test_ab_final_line_fits_driver_capture():
    """The A/B verdict line must respect the same tail-capture budget as
    the normal final line — including at the 24-rep stdout cap (the full
    series goes to BENCH_AB.json; the line truncates past the cap so an
    overnight many-rep run cannot fail AFTER hours of work)."""
    verdict = {
        "metric": "headline_suite_ab",
        "ref": "0123abc",
        "reps": 999,
        "ref_runs": [999.999] * 24,
        "head_runs": [999.999] * 24,
        "ref_median": 999.999,
        "head_median": 999.999,
        "head_over_ref": 1.0,
        "sf": 0.1,
    }
    assert len(json.dumps(verdict)) <= bench.MAX_FINAL_LINE
