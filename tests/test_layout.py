"""operators/layout.py — Z-order clustering and the pruning report.

The Morton kernel is verified bit-for-bit against an independent pure-
Python interleave (including a hypothesis sweep of the full 8-bit grid
domain), and the layout entries are verified structurally: z-buckets must
be compact rectangles in BOTH grid dimensions, and the pruning report must
reproduce the analytic file counts the bit layout implies — these are
exact consequences of the math, not tolerances.
"""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from auto_vectordb_spark.operators import layout as L
from auto_vectordb_spark.plans.parity import load_views

SF = "/root/testdata/sf0.001"


def py_spread8(v: int) -> int:
    v &= 0xFF
    v = (v | (v << 4)) & 0x0F0F
    v = (v | (v << 2)) & 0x3333
    v = (v | (v << 1)) & 0x5555
    return v


def py_morton16(x: int, y: int) -> int:
    return py_spread8(x) | (py_spread8(y) << 1)


@given(
    st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=64,
    )
)
@settings(max_examples=8, deadline=None)
def test_morton_matches_pure_python(spark, pairs):
    df = spark.createDataFrame(pairs, "x: long, y: long")
    got = df.select(
        "x", "y", L.morton16(F.col("x"), F.col("y")).alias("z")
    ).collect()
    for r in got:
        assert r.z == py_morton16(r.x, r.y)


def test_morton_bijective_on_grid(spark):
    """All 256x256 grid cells map to distinct z in [0, 65535]."""
    cells = spark.range(L.GRID * L.GRID).select(
        (F.col("id") % L.GRID).alias("x"), (F.col("id") / L.GRID).cast("long").alias("y")
    )
    zs = cells.select(L.morton16(F.col("x"), F.col("y")).alias("z"))
    agg = zs.agg(
        F.count_distinct("z").alias("n"), F.min("z").alias("lo"), F.max("z").alias("hi")
    ).first()
    assert agg.n == L.GRID * L.GRID and agg.lo == 0 and agg.hi == L.GRID * L.GRID - 1


def test_morton_sql_twin_matches(spark):
    """The DuckDB-dialect SQL twin computes the identical interleave."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT x, y, {L.morton_sql('x', 'y')} AS z "
        "FROM (SELECT range % 256 AS x, range // 256 AS y "
        "      FROM range(65536) WHERE range % 131 = 0)"
    ).fetchall()
    assert rows, "sample must not be empty"
    for x, y, z in rows:
        assert z == py_morton16(x, y)


def test_zbuckets_are_compact_rectangles(spark):
    """Every 6-bit z-bucket covers exactly one 32x32 grid rectangle, so a
    bucket's min-max stats are tight in BOTH dimensions — the property
    that makes two-dimensional pruning work. A single-dimension sort
    cannot have this: its buckets span the full range of the other dim."""
    t = load_views(spark, SF)
    stats = L.zorder_bucket_stats(t["events"]).collect()
    assert 1 <= len(stats) <= 64
    for r in stats:
        # 3 x-bits + 3 y-bits of bucket id → 32-cell-aligned 32x32 tile
        assert r.x_hi - r.x_lo <= 31, r
        assert r.y_hi - r.y_lo <= 31, r
        assert r.x_lo // 32 == r.x_hi // 32, r
        assert r.y_lo // 32 == r.y_hi // 32, r
    assert sum(r.n_rows for r in stats) == (
        t["events"].where(F.col("user_id").isNotNull() & F.col("ts").isNotNull()).count()
    )


def test_pruning_gain_analytic_shape(spark):
    """With dense data, the probe/file geometry is exact: each 32-cell
    probe intersects 8 of 64 z-tiles and 8 of 64 single-dim stripes in
    its own dimension, ALL 64 stripes in the other, and the rectangle
    probe exactly one z-tile. Sparse SFs can only hit FEWER files, so
    the assertions are <=-shaped where emptiness is possible and the
    z-vs-single-dim ordering is kept strict."""
    t = load_views(spark, SF)
    r = L.zorder_pruning_gain(t["events"]).first()
    assert r.files_total <= 64
    # z-order prunes both single-dimension probes to at most 8 tiles
    assert r.z_key_probe <= 8 and r.z_time_probe <= 8
    assert r.z_rect_probe <= 1
    # each single-dim layout is blind to the OTHER dimension: a probe
    # there opens every file that has any data (strictly worse than z
    # whenever the table is non-trivial)
    if r.n_rows >= 10_000:  # dense enough that every stripe is populated
        assert r.keysort_time_probe == r.files_total
        assert r.timesort_key_probe == r.files_total
        assert r.z_time_probe < r.keysort_time_probe
        assert r.z_key_probe < r.timesort_key_probe


def test_compaction_plan_structure(spark):
    """Every bucket gets exactly one decision row; the split accounting is
    exact (base+delta == valid rows); the action matches the documented
    threshold formula row-by-row."""
    t = load_views(spark, SF)
    plan = L.zorder_compaction_plan(t["events"]).collect()
    assert 1 <= len(plan) <= 64
    ev = t["events"].where(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
    )
    assert sum(r.base_rows + r.delta_rows for r in plan) == ev.count()
    for r in plan:
        expect = (
            "rewrite"
            if r.base_rows == 0 or r.delta_rows * 100 >= r.base_rows * 10
            else "defer"
        )
        assert r.action == expect, r


def test_compaction_empty_base_means_no_plan(spark):
    """All-delta input (every id % 10 == 0) has no existing layout to
    maintain — the correct plan is an initial write, i.e. EMPTY."""
    from datetime import datetime

    rows = [(i * 10, datetime(2024, 1, 1, i), i) for i in range(5)]
    ev = spark.createDataFrame(rows, "event_id: long, ts: timestamp, user_id: long")
    assert L.zorder_compaction_plan(ev).count() == 0


def test_compaction_out_of_range_delta_clamps_to_edge_bucket(spark):
    """An arrival outside the frozen base grid cannot invent a new grid:
    it clamps into the edge bucket, which then shows delta pressure."""
    from datetime import datetime

    base = [
        (i, datetime(2024, 1, 1 + (i % 20), i % 24), 100 + i)
        for i in range(1, 41)
        if i % 10 != 0  # keep the base batch purely non-delta
    ]
    # delta row (id % 10 == 0) far outside the base user range
    delta = [(10, datetime(2024, 1, 5, 3), 10_000)]
    ev = spark.createDataFrame(
        base + delta, "event_id: long, ts: timestamp, user_id: long"
    )
    plan = {r.z_bucket: r for r in L.zorder_compaction_plan(ev).collect()}
    # the clamped delta row lands in SOME bucket with xg == 255 → its
    # bucket must exist and be marked rewrite if small
    hit = [r for r in plan.values() if r.delta_rows > 0]
    assert len(hit) == 1
    assert hit[0].action == "rewrite"  # 1 delta vs few base rows in that tile
    assert sum(r.base_rows for r in plan.values()) == 36
    assert sum(r.delta_rows for r in plan.values()) == 1


def test_hash_range_keys_do_not_overflow_grid(spark):
    """Hash-derived ids (the canonical z-order key) span the full int64
    range; the divide-only grid formula must keep every coordinate in
    [0, GRID-1] where a (x - xmin) * GRID multiply would wrap negative."""
    from datetime import datetime

    rows = [
        (-(2**62), datetime(2024, 1, 1, 0)),
        (2**62 - 1, datetime(2024, 1, 20, 5)),
        (7_450_580_596_923_828, datetime(2024, 1, 10, 3)),
        (-12, datetime(2024, 1, 15, 9)),
        (0, datetime(2024, 1, 5, 12)),
    ]
    ev = spark.createDataFrame(rows, "user_id: long, ts: timestamp")
    g = L.zorder_frame(ev).collect()
    assert len(g) == len(rows)
    for r in g:
        assert 0 <= r.xg <= L.GRID - 1, r
        assert 0 <= r.yg <= L.GRID - 1, r
        assert 0 <= r.z <= 65535, r


def test_hour_index_floors_pre_epoch_timestamps(spark):
    """Pre-1970 timestamps have negative epoch microseconds; the hour
    index must FLOOR (DuckDB // semantics), not truncate toward zero."""
    from datetime import datetime

    rows = [
        (1, datetime(1969, 12, 31, 23, 30)),  # -0.5h -> floor = -1
        (2, datetime(1970, 1, 1, 0, 30)),  # +0.5h -> 0
        (3, datetime(1965, 6, 1, 7, 59)),
    ]
    df = spark.createDataFrame(rows, "id: long, ts: timestamp")
    got = {
        r.id: r.h
        for r in df.select("id", L._hour_index("ts").alias("h")).collect()
    }
    import calendar

    for id_, ts in rows:
        us = calendar.timegm(ts.timetuple()) * 1_000_000
        assert got[id_] == us // 3_600_000_000, (id_, got[id_])


def test_hour_index_sql_twin_matches_spark_pre_epoch(spark):
    """DuckDB's integer ``//`` truncates toward zero (verified:
    (-1800000000)//3600000000 = 0 on DuckDB 1.0), so a bare
    ``epoch_us(ts) // h`` oracle DIVERGES from Spark's floored hour
    index on pre-1970 timestamps. hour_index_sql floors explicitly;
    this pins Spark and DuckDB to the identical value on both sides of
    the epoch — the case sf fixtures (all post-2020) cannot catch."""
    from datetime import datetime

    import duckdb

    rows = [
        (1, datetime(1969, 12, 31, 23, 30)),  # -0.5h: trunc=0, floor=-1
        (2, datetime(1969, 12, 31, 0, 0)),
        (3, datetime(1965, 6, 1, 7, 59)),
        (4, datetime(1970, 1, 1, 0, 30)),
        (5, datetime(2024, 3, 9, 17, 1)),
    ]
    df = spark.createDataFrame(rows, "id: long, ts: timestamp")
    got_spark = {
        r.id: r.h
        for r in df.select("id", L._hour_index("ts").alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(id BIGINT, ts TIMESTAMP); "
        + "INSERT INTO t VALUES "
        + ",".join(f"({i}, TIMESTAMP '{ts}')" for i, ts in rows)
    )
    got_duck = dict(
        con.execute(
            f"SELECT id, {L.hour_index_sql('ts')} FROM t"
        ).fetchall()
    )
    assert got_spark == got_duck
    assert got_spark[1] == -1  # floored, not truncated


def test_compaction_extreme_delta_does_not_overflow_stretch_branch(spark):
    """The stretch branch is chosen from the BASE range, but deltas are
    not bounded by it: with a narrow base range (~1e3, multiply-safe) and
    a delta key near 2^62, gridding the raw delta value would overflow
    (v - vmin) * GRID in int64 — ANSI kills the job, non-ANSI silently
    wraps to a wrong bucket. The input clamp must land it in the edge
    bucket instead, on BOTH engines."""
    from datetime import datetime

    import duckdb

    base = [
        (i, datetime(2024, 1, 1 + (i % 20), i % 24), 1000 + i)
        for i in range(1, 41)
        if i % 10 != 0
    ]
    deltas = [
        (10, datetime(2024, 1, 5, 3), 2**62),  # far above base range
        (20, datetime(2024, 1, 7, 9), -(2**62)),  # far below
    ]
    ev = spark.createDataFrame(
        base + deltas, "event_id: long, ts: timestamp, user_id: long"
    )
    plan = L.zorder_compaction_plan(ev).collect()
    assert sum(r.delta_rows for r in plan) == 2
    assert sum(r.base_rows for r in plan) == 36
    # oracle twin runs the identical clamped formula without erroring
    from auto_vectordb_spark.plans.parity import REGISTRY

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT); "
        + "INSERT INTO events VALUES "
        + ",".join(
            f"({e}, TIMESTAMP '{ts}', {u})" for e, ts, u in base + deltas
        )
    )
    oracle = con.execute(REGISTRY["zorder_compaction_plan"].sql).fetchall()
    got = sorted((r.z_bucket, r.base_rows, r.delta_rows, r.action) for r in plan)
    assert got == sorted(tuple(r) for r in oracle)


def test_empty_and_null_rows_fail_row_not_job(spark):
    """cleanvec doctrine: NULL key/ts rows are dropped; an empty table
    yields the schema-correct empty stats frame and a zeroed one-row
    pruning report (count aggregates over nothing)."""
    ev = spark.createDataFrame(
        [(None, None), (5, None)], "user_id: long, ts: timestamp"
    )
    assert L.zorder_bucket_stats(ev).count() == 0
    r = L.zorder_pruning_gain(ev).first()
    assert r.n_rows == 0 and r.files_total == 0 and r.z_rect_probe == 0


def test_probe_buckets_matches_brute_force():
    """The driver-side candidate enumeration must equal the set of buckets
    any matching row could land in — brute force over the rectangle."""
    for xr, yr in [((64, 95), (160, 191)), ((0, 7), (0, 7)), ((250, 255), (0, 255))]:
        want = sorted(
            {py_morton16(x, y) >> 10 for x in range(xr[0], xr[1] + 1) for y in range(yr[0], yr[1] + 1)}
        )
        assert L.probe_buckets(xr, yr) == want


def test_zorder_write_probe_scan_prunes_physically(spark, tmp_path):
    """The loop-closer: zorder_pruning_gain PREDICTS file counts; the
    written table must actually deliver them — the pruned scan's physical
    inputFiles() must shrink to the candidate directories, and the probe
    aggregates must equal recomputing over the raw frame."""
    from auto_vectordb_spark.plans.parity import load_views

    t = load_views(spark, SF)
    path = str(tmp_path / "ztable")
    L.zorder_write(t["events"], path)
    full = spark.read.schema(
        "event_id long, xg long, yg long, z_bucket long"
    ).parquet(path)
    n_files_full = len(full.inputFiles())
    cand = L.probe_buckets(L.PROBE_X, L.PROBE_Y)
    pruned = full.where(F.col("z_bucket").isin(cand))
    pruned.collect()
    # inputFiles() ignores partition filters (it lists the relation); the
    # physical evidence is the executed scan node: the bucket IN must land
    # in PartitionFilters (directory-level, planning-time) and the
    # post-execution numFiles metric must shrink to the candidate set.
    plan = pruned._jdf.queryExecution().executedPlan()
    scan = plan.collectLeaves().head()
    n_files_read = scan.metrics().apply("numFiles").value()
    assert "PartitionFilters: [" in plan.toString()
    assert n_files_read <= len(cand) < n_files_full
    r = L.zorder_probe_scan(spark, path).first()
    assert r.files_total == n_files_full
    assert r.files_scanned == n_files_read
    # probe aggregates equal recomputation over the annotated frame
    g = L.zorder_frame(t["events"])
    want = g.where(
        F.col("xg").between(*L.PROBE_X) & F.col("yg").between(*L.PROBE_Y)
    ).count()
    assert r.n_rows == want


def test_zorder_write_probe_empty_table(spark, tmp_path):
    """Nothing survives the NULL filter: the write yields a fileless table
    and the probe must return the schema-correct zero row, not fail."""
    ev = spark.createDataFrame(
        [(1, None, None)], "event_id: long, user_id: long, ts: timestamp"
    )
    path = str(tmp_path / "zempty")
    L.zorder_write(ev, path)
    r = L.zorder_probe_scan(spark, path).first()
    assert r.n_rows == 0 and r.files_total == 0 and r.files_scanned == 0
    assert r.sum_payload is None
