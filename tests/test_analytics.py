"""Engine-level tests for operators/analytics.py (event-volume monitors).

The oracle parity entries (events_anomaly_zscore/mad, events_seasonal_deviation)
cross-check values against DuckDB on the fixture corpus; these tests pin the
semantics on hand-built micro-fixtures where the right answer is computable
by hand.
"""

from datetime import datetime

import pytest

from auto_vectordb_spark.operators import analytics as AN
from auto_vectordb_spark.operators.analytics import (
    hourly_counts,
    seasonal_deviation,
    volume_anomaly_mad,
    volume_anomaly_zscore,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, ["event_type", "ts"])


@pytest.fixture(scope="module")
def spiky(spark):
    # type "a": 11 calm hours with 10 events, one spike hour with 100
    rows = []
    for h in range(11):
        rows += [("a", datetime(2024, 1, 1, h, 5))] * 10
    rows += [("a", datetime(2024, 1, 1, 11, 5))] * 100
    # type "b": perfectly flat — never anomalous under any detector
    for h in range(12):
        rows += [("b", datetime(2024, 1, 1, h, 30))] * 7
    return _events(spark, rows)


def test_hourly_counts_reduction(spark, spiky):
    got = {
        (r["event_type"], r["hour"]): r["n_events"] for r in hourly_counts(spiky).collect()
    }
    assert got[("a", "2024-01-01 11:00")] == 100
    assert got[("a", "2024-01-01 03:00")] == 10
    assert all(v == 7 for (t, _), v in got.items() if t == "b")


def test_zscore_flags_spike_only(spark, spiky):
    rows = volume_anomaly_zscore(spiky).collect()
    flagged = {(r["event_type"], r["hour"]) for r in rows if r["is_anomaly"]}
    assert flagged == {("a", "2024-01-01 11:00")}
    # zero-variance type scores z=0 everywhere
    assert all(r["z"] == 0.0 for r in rows if r["event_type"] == "b")


def test_mad_flags_spike_and_resists_masking(spark, spiky):
    rows = volume_anomaly_mad(spiky).collect()
    a = {r["hour"]: r for r in rows if r["event_type"] == "a"}
    # median of (10×11, 100) = 10; MAD must be 0 -> plain MAD never flags a
    # majority-constant series; perturb to get nonzero MAD
    assert all(not r["is_anomaly"] for r in rows if r["event_type"] == "b")
    assert a["2024-01-01 11:00"]["med"] == 10.0

    rows2 = []
    for h, n in enumerate([8, 9, 10, 10, 11, 12, 100]):
        rows2 += [("a", datetime(2024, 1, 2, h, 0))] * n
    got = {r["hour"]: r for r in volume_anomaly_mad(_events(spark, rows2)).collect()}
    assert got["2024-01-02 06:00"]["is_anomaly"]
    assert sum(1 for r in got.values() if r["is_anomaly"]) == 1


def test_seasonal_deviation_uses_hour_of_day_baseline(spark):
    # 2am is ALWAYS 5 events, noon is always 50 across 3 days; on day 4,
    # 2am=50 must deviate by +45 even though 50 is a normal noon volume
    rows = []
    for d in (1, 2, 3):
        rows += [("a", datetime(2024, 1, d, 2, 0))] * 5
        rows += [("a", datetime(2024, 1, d, 12, 0))] * 50
    rows += [("a", datetime(2024, 1, 4, 2, 0))] * 50
    got = {r["hour"]: r for r in seasonal_deviation(_events(spark, rows)).collect()}
    anom = got["2024-01-04 02:00"]
    # baseline for hod=2 is (5+5+5+50)/4 = 16.25 (the day-4 hour is part of
    # its own baseline — streaming deployments freeze baselines instead)
    assert anom["expected"] == 16.25
    assert anom["deviation"] == 33.75
    assert got["2024-01-01 12:00"]["deviation"] == 0.0


def test_source_embedding_drift_pairwise_centroid_cosine(spark):
    import math

    from auto_vectordb_spark.operators import analytics as AN

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        ["vec_id", "embedding"],
    )
    docs = spark.createDataFrame(
        [(0, "sA"), (1, "sA"), (2, "sB"), (3, "sC")], ["doc_id", "source"]
    )
    rows = {(r["src_a"], r["src_b"]): r for r in AN.source_embedding_drift(
        emb, docs).collect()}
    assert set(rows) == {("sA", "sB"), ("sA", "sC"), ("sB", "sC")}
    ab = rows[("sA", "sB")]
    assert (ab["n_a"], ab["n_b"]) == (2, 1)
    assert ab["cos"] == 0.0  # orthogonal centroids
    assert math.isclose(rows[("sA", "sC")]["cos"], 1 / math.sqrt(2), abs_tol=1e-6)


def test_source_embedding_drift_ragged_vectors_divide_per_dim(spark):
    """Each centroid element divides by ITS OWN (source, dim) count, not the
    per-source max — on ragged vectors a max-n denominator understates the
    under-populated dims (the round-5 advice finding)."""
    import math

    from auto_vectordb_spark.operators import analytics as AN

    # source sA: one 2-dim vector and one 1-dim vector. dim0 mean =
    # (1+1)/2 = 1.0; dim1 mean = 2.0/1 = 2.0 (NOT 2.0/2 = 1.0).
    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0]), (2, [1.0, 2.0])],
        ["vec_id", "embedding"],
    )
    docs = spark.createDataFrame(
        [(0, "sA"), (1, "sA"), (2, "sB")], ["doc_id", "source"]
    )
    row = AN.source_embedding_drift(emb, docs).collect()[0]
    # centroid sA = [1, 2] element-wise == centroid sB exactly -> cos 1
    assert (row["src_a"], row["src_b"]) == ("sA", "sB")
    assert math.isclose(row["cos"], 1.0, abs_tol=1e-6)


def test_source_embedding_drift_oracle_matches_engine_on_ragged(spark):
    """Cross-engine pin of the round-6 advice: the oracle's dim cross
    join pads ragged vectors with NULL-x rows, which its old count(*)
    per-dim n included — diverging from the engine's posexplode-derived
    count of PRESENT dims (oracle sA dim1 mean 2.0/2 vs engine 2.0/1).
    With count(x) both engines divide by the same per-dim count. The
    probe range is shrunk 65→3 so the scenario's 1-dim vector is ragged
    relative to it without needing 64-dim fixtures."""
    import math

    import duckdb

    from auto_vectordb_spark.operators import analytics as AN
    from auto_vectordb_spark.plans.parity import REGISTRY

    emb_rows = [(0, [1.0, 2.0]), (1, [1.0]), (2, [1.0, 2.0])]
    emb = spark.createDataFrame(emb_rows, "vec_id long, embedding array<double>")
    docs = spark.createDataFrame(
        [(0, "sA"), (1, "sA"), (2, "sB")], ["doc_id", "source"]
    )
    got = AN.source_embedding_drift(emb, docs).collect()[0]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {v!r}::DOUBLE[])" for i, v in emb_rows)
        + ") t(vec_id, embedding)"
    )
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM "
        "(VALUES (0, 'sA'), (1, 'sA'), (2, 'sB')) t(doc_id, source)"
    )
    sql = REGISTRY["source_embedding_drift"].sql.replace(
        "range(1, 65)", "range(1, 3)"
    )
    want = con.execute(sql).fetchone()
    assert (got["src_a"], got["src_b"], got["n_a"], got["n_b"]) == want[:4]
    assert math.isclose(got["cos"], want[4], abs_tol=1e-9)


def test_recency_weighted_volume_exact_dyadic_weights(spark):
    import datetime as dt
    from pyspark.sql import functions as F

    base = dt.datetime(2026, 1, 1)
    week = dt.timedelta(days=7)
    rows = [
        (1, base, "a"),              # newest -> age 0 -> h=0 -> w=2^20
        (2, base - week, "a"),       # exactly 1 half-life -> h=1 -> 2^19
        (3, base - 3 * week, "b"),   # h=3 -> 2^17
        (4, base - dt.timedelta(days=500), "b"),  # h capped at 20 -> w=1
        (5, None, "b"),              # null ts excluded
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    out = {r["event_type"]: r for r in AN.recency_weighted_volume(ev).collect()}
    assert out["a"]["n_events"] == 2
    assert out["a"]["weighted_q"] == 2**20 + 2**19
    assert out["a"]["weighted"] == 1.5
    assert out["b"]["n_events"] == 2  # null-ts row excluded
    assert out["b"]["weighted_q"] == 2**17 + 1
    assert out["b"]["weighted"] == (2**17 + 1) / 2**20
