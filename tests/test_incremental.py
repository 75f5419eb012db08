"""operators/incremental.py — persisted-state merges attested equal to
from-scratch recomputes.

Each merge family is checked for its defining algebra: rollup partials
add exactly through a parquet round-trip, top-k state stays k-bounded
and merge-equal under any batch split, and session state stitches
boundary sessions so chained merges equal one-shot sessionization —
including the adversarial boundary cases (gap exactly at the timeout,
user absent from one side, multi-batch chaining).
"""

import pytest
from pyspark.sql import functions as F

from auto_vectordb_spark.operators import incremental as IC
from auto_vectordb_spark.plans.parity import load_views

SF = "/root/testdata/sf0.001"

CUTOFF = "2024-01-16 00:00:00"


@pytest.fixture(scope="module")
def events(spark):
    return load_views(spark, SF)["events"]


def _rows(df, key_cols):
    return {
        tuple(r[c] for c in key_cols): r
        for r in df.collect()
    }


def test_rollup_merge_equals_from_scratch(spark, events, tmp_path):
    old = events.where(F.col("ts") < CUTOFF)
    new = events.where(F.col("ts") >= CUTOFF)
    state = IC.hourly_rollup(old)
    path = str(tmp_path / "rollup_state")
    state.write.parquet(path)
    stored = spark.read.schema(state.schema).parquet(path)
    got = _rows(
        IC.rollup_finalize(IC.rollup_merge(stored, new)),
        ["window_start", "event_type"],
    )
    want = _rows(
        IC.rollup_finalize(IC.hourly_rollup(events)),
        ["window_start", "event_type"],
    )
    assert set(got) == set(want)
    for k in want:
        assert got[k].n_events == want[k].n_events
        assert got[k].sum_value == want[k].sum_value  # int64 partials: exact


def test_rollup_merge_empty_delta_and_empty_state(spark, events):
    state = IC.hourly_rollup(events)
    empty = spark.createDataFrame([], events.schema)
    merged = IC.rollup_merge(state, empty)
    assert merged.count() == state.count()
    from_empty = IC.rollup_merge(IC.hourly_rollup(empty), events)
    assert _rows(from_empty, ["window_start", "event_type"]).keys() == _rows(
        state, ["window_start", "event_type"]
    ).keys()


def test_topk_merge_equals_from_scratch(spark):
    t = load_views(spark, SF)
    j = (
        t["orders"]
        .join(
            F.broadcast(t["customer"]),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_mktsegment",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )
    old = j.where(F.pmod(F.col("o_orderkey"), F.lit(10)) != 0)
    new = j.where(F.pmod(F.col("o_orderkey"), F.lit(10)) == 0)
    args = (["c_mktsegment"], "o_totalprice", 3, "o_orderkey")
    state = IC.topk_state(old, *args)
    merged = IC.topk_merge(state, new, *args)
    want = IC.topk_state(j, *args)
    key = lambda df: sorted(
        (r.c_mktsegment, r.o_orderkey, r.o_totalprice) for r in df.collect()
    )
    assert key(merged) == key(want)
    # state stays k-bounded per group
    per_group = merged.groupBy("c_mktsegment").count().collect()
    assert all(r["count"] <= 3 for r in per_group)


def test_session_merge_equals_from_scratch(spark, events):
    old = events.where(F.col("ts") < CUTOFF)
    new = events.where(F.col("ts") >= CUTOFF)
    merged = IC.session_merge(IC.session_state(old), IC.session_state(new))
    want = _rows(IC.session_state(events), ["user_id"])
    got = _rows(merged, ["user_id"])
    assert set(got) == set(want)
    for k in want:
        assert got[k].n_sessions == want[k].n_sessions, k
        assert got[k].n_events == want[k].n_events
        assert got[k].first_ts == want[k].first_ts
        assert got[k].last_ts == want[k].last_ts


def test_session_merge_chains_across_batches(spark, events):
    """merge(merge(s1, s2), s3) must equal one-shot sessionize — the
    state output is itself mergeable state."""
    c1, c2 = "2024-01-11 00:00:00", "2024-01-21 00:00:00"
    b1 = events.where(F.col("ts") < c1)
    b2 = events.where((F.col("ts") >= c1) & (F.col("ts") < c2))
    b3 = events.where(F.col("ts") >= c2)
    chained = IC.session_merge(
        IC.session_merge(IC.session_state(b1), IC.session_state(b2)),
        IC.session_state(b3),
    )
    want = _rows(IC.session_state(events), ["user_id"])
    got = _rows(chained, ["user_id"])
    assert set(got) == set(want)
    for k in want:
        assert (got[k].n_sessions, got[k].n_events) == (
            want[k].n_sessions,
            want[k].n_events,
        )


def test_session_stitch_boundary_cases(spark):
    """The stitch rule at the exact timeout: gap <= 30min joins the
    boundary sessions (matching events_sessionize's strict > test for a
    NEW session); gap just over splits them."""
    old = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00"), (2, 2, "2024-01-01 10:00:00")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    new = spark.createDataFrame(
        [(3, 1, "2024-01-01 10:30:00"), (4, 2, "2024-01-01 10:30:01")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    merged = _rows(
        IC.session_merge(IC.session_state(old), IC.session_state(new)),
        ["user_id"],
    )
    assert merged[(1,)].n_sessions == 1  # 1800s gap: same session
    assert merged[(2,)].n_sessions == 2  # 1801s gap: split
    # one-sided users pass through
    only_old = spark.createDataFrame(
        [(9, 9, "2024-01-01 00:00:00")], "event_id long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    empty = spark.createDataFrame([], only_old.schema)
    m2 = _rows(
        IC.session_merge(IC.session_state(only_old), IC.session_state(empty)),
        ["user_id"],
    )
    assert m2[(9,)].n_sessions == 1 and m2[(9,)].n_events == 1


def _scd2_rows(df):
    return sorted(
        (r.user_id, r.state, r.valid_from_s, r.valid_to_s, r.n_events)
        for r in df.collect()
    )


def test_scd2_merge_equals_from_scratch(spark, events):
    old = events.where(F.col("ts") < CUTOFF)
    new = events.where(F.col("ts") >= CUTOFF)
    merged = IC.scd2_finalize(
        IC.scd2_merge(IC.scd2_state(old), IC.scd2_state(new))
    )
    want = IC.scd2_finalize(IC.scd2_state(events))
    assert _scd2_rows(merged) == _scd2_rows(want)


def test_scd2_merge_chains_across_batches(spark, events):
    c1, c2 = "2024-01-11 00:00:00", "2024-01-21 00:00:00"
    b1 = events.where(F.col("ts") < c1)
    b2 = events.where((F.col("ts") >= c1) & (F.col("ts") < c2))
    b3 = events.where(F.col("ts") >= c2)
    chained = IC.scd2_finalize(
        IC.scd2_merge(
            IC.scd2_merge(IC.scd2_state(b1), IC.scd2_state(b2)),
            IC.scd2_state(b3),
        )
    )
    want = IC.scd2_finalize(IC.scd2_state(events))
    assert _scd2_rows(chained) == _scd2_rows(want)


def test_scd2_stitch_boundary_cases(spark):
    """Same state straddling the boundary coalesces into ONE island with
    the old valid_from; a state change at the boundary closes the open
    row at the first new island's valid_from. One-sided users pass."""
    old = spark.createDataFrame(
        [
            (1, 1, "view", "2024-01-01 10:00:00"),
            (2, 1, "view", "2024-01-01 10:05:00"),
            (3, 2, "view", "2024-01-01 10:00:00"),
        ],
        "event_id long, user_id long, event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    new = spark.createDataFrame(
        [
            (4, 1, "view", "2024-01-01 11:00:00"),   # same state: coalesce
            (5, 1, "click", "2024-01-01 11:30:00"),
            (6, 2, "click", "2024-01-01 11:00:00"),  # state change: close
        ],
        "event_id long, user_id long, event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (r.user_id, r.state): r
        for r in IC.scd2_finalize(
            IC.scd2_merge(IC.scd2_state(old), IC.scd2_state(new))
        ).collect()
    }
    # user 1: ONE view island (3 events, old vf, closed by click), then click
    assert got[(1, "view")].n_events == 3
    assert got[(1, "view")].valid_from_s == "2024-01-01 10:00:00"
    assert got[(1, "view")].valid_to_s == "2024-01-01 11:30:00"
    assert got[(1, "click")].valid_to_s is None
    # user 2: view closed at the boundary click
    assert got[(2, "view")].valid_to_s == "2024-01-01 11:00:00"
    assert got[(2, "click")].n_events == 1
    # one-sided user passes through
    only_new = spark.createDataFrame(
        [(9, 9, "view", "2024-01-01 00:00:00")],
        "event_id long, user_id long, event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    empty = spark.createDataFrame([], only_new.schema)
    m = IC.scd2_finalize(
        IC.scd2_merge(IC.scd2_state(empty), IC.scd2_state(only_new))
    ).collect()
    assert len(m) == 1 and m[0].n_events == 1 and m[0].valid_to_s is None


def test_session_state_dirty_rows_fail_row(spark):
    dirty = spark.createDataFrame(
        [
            (1, None, "2024-01-01 00:00:00"),
            (2, 5, None),
            (3, 5, "2024-01-01 00:00:00"),
        ],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = IC.session_state(dirty).collect()
    assert len(rows) == 1 and rows[0].user_id == 5 and rows[0].n_events == 1
