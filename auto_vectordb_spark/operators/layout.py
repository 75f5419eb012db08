"""Data-layout planning: Z-order (Morton) clustering and pruning analysis.

At 100 TB the dominant cost of an interactive query is the SCAN, and the
scan cost is set by the table's physical layout: parquet row-group /
file-level min-max statistics prune a file only when the file is narrow in
the probed dimension. A single-dimension sort (`ORDER BY user_id`) makes
user-probes cheap and time-probes full scans; interleaving the bits of two
normalized keys (a Morton / Z-order curve) yields files that are narrow
RECTANGLES in (key, time) space, so BOTH dimensions prune — this is what
Delta Lake's ``OPTIMIZE ZORDER BY`` and Iceberg's z-ordered rewrites do.

Everything here is deterministic integer arithmetic on JVM-side column
expressions (whole-stage codegen; the identical formulas run in the DuckDB
oracle), so the layout decision itself is a cheap map + one tiny min-max
aggregate — no sampling, no RangePartitioner nondeterminism. At scale the
z-value feeds ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` at
write time; the analysis entries here report the layout QUALITY instead
(bucket rectangles and probe pruning ratios), which is the decision input
a compaction planner needs and is exactly reproducible cross-engine.

Reference scope note: the reference system (kstyle2198/auto_vectordb) has
no layout planner — this module is part of the training-data-pipeline
extension surface (SURVEY.md "beyond the reference" mandate), motivated by
its hot probe shapes (per-user recency scans in postgres.py, time-windowed
event rollups) which at warehouse scale are exactly the two-dimensional
probes z-ordering serves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Grid resolution: each dimension is normalized to [0, GRID-1] (8 bits),
#: so the interleaved z-value fits 16 bits and a >> shift yields file
#: buckets. 256 cells/dim × 2 dims ≫ any realistic file count per table
#: partition; finer grids change nothing structurally.
GRID_BITS = 8
GRID = 1 << GRID_BITS


def spread_bits8(c: Column) -> Column:
    """Spread the low 8 bits of ``c`` to the even bit positions of a
    16-bit value (0b0000abcd -> 0b0a0b0c0d pattern), the classic
    mask-shift interleave kernel. Pure int64 expression — bit-identical
    in any engine with ``&``, ``|``, ``<<``."""
    x = c.bitwiseAND(F.lit(0xFF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x3333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x5555))
    return x


def morton16(x: Column, y: Column) -> Column:
    """16-bit Morton code of two 8-bit grid coordinates: x owns the even
    bits, y the odd bits. Adjacent z-values are adjacent grid cells, so a
    contiguous z-range is a compact rectangle-ish region of (x, y) space."""
    return spread_bits8(x).bitwiseOR(F.shiftleft(spread_bits8(y), 1))


def spread_sql(expr: str) -> str:
    """DuckDB twin of :func:`spread_bits8` (same mask-shift chain)."""
    s = f"(({expr}) & 255)"
    s = f"((({s} | ({s} << 4)) & 3855))"
    s = f"((({s} | ({s} << 2)) & 13107))"
    s = f"((({s} | ({s} << 1)) & 21845))"
    return s


def morton_sql(x_expr: str, y_expr: str) -> str:
    """DuckDB twin of :func:`morton16`."""
    return f"({spread_sql(x_expr)} | ({spread_sql(y_expr)} << 1))"


#: Key ranges below this stretch onto the grid with the exact multiply
#: formula ((v - vmin) * GRID never exceeds 2^63); wider ranges (hash-
#: derived ids span the full int64 space on day one) fall back to the
#: divide-only formula, which cannot overflow but does not stretch a
#: narrow range across the whole grid. Both branches are deterministic
#: integer arithmetic, identical in Spark and DuckDB.
_MULTIPLY_SAFE_RANGE = 1 << 55


def grid_expr_sql(v: str, vmin: str, vmax: str, div: str = "div") -> str:
    """Grid coordinate of ``v`` within [vmin, vmax] as engine-portable
    SQL (``div`` for Spark, ``//`` for DuckDB — the only dialect
    difference; BOTH truncate toward zero on integers). Guarded hybrid:
    exact multiply-stretch when the range is provably multiply-safe,
    overflow-free divide otherwise. Callers must guarantee
    vmin <= v <= vmax (zorder_frame filters to the observed range;
    zorder_compaction_plan clamps the input first), so every numerator
    is non-negative, truncation equals flooring in both dialects, and
    both branches land in [0, GRID-1]."""
    rng = f"({vmax} - {vmin})"
    stretch = f"((({v} - {vmin}) * {GRID}) {div} ({rng} + 1))"
    safe = f"(({v} - {vmin}) {div} ({rng} {div} {GRID} + 1))"
    return f"(CASE WHEN {rng} < {_MULTIPLY_SAFE_RANGE} THEN {stretch} ELSE {safe} END)"


def _hour_index(ts_col: str):
    """Hours since the epoch as an int64, FLOOR semantics on both sides
    of the epoch: ``(us - pmod(us, h)) div h`` floors for negative
    microseconds too (pmod is non-negative, so the numerator is an exact
    multiple of h and truncating div equals flooring div). A bare ``div``
    truncates toward zero and would be off by one pre-1970. DuckDB's
    integer ``//`` ALSO truncates toward zero (verified:
    ``(-1800000000) // 3600000000 = 0`` on DuckDB 1.0), so the oracle
    twin is :func:`hour_index_sql`, which floors via the same
    pmod-subtract formula — never a bare ``//`` on the raw micros."""
    us = f"unix_micros({ts_col})"
    return F.expr(f"({us} - pmod({us}, 3600000000)) div 3600000000")


def hour_index_sql(ts_expr: str) -> str:
    """DuckDB twin of :func:`_hour_index`: explicit-floor hour index.
    DuckDB's integer ``//`` truncates toward zero (unlike its float
    ``//``), so the numerator is first reduced to an exact multiple of
    3600000000 via a non-negative modulus — after which truncation and
    flooring agree, exactly as on the Spark side."""
    us = f"epoch_us({ts_expr})"
    h = "3600000000"
    return f"(({us} - ((({us} % {h}) + {h}) % {h})) // {h})"


def zorder_frame(
    events: DataFrame,
    x_col: str = "user_id",
    ts_col: str = "ts",
    bucket_bits: int = 6,
) -> DataFrame:
    """Annotate ``events`` with grid coordinates, z-value and layout
    bucket ids under three candidate layouts.

    Columns added (all BIGINT, all deterministic):

    - ``xg``/``yg``: the key and hour-index normalized to the 256-cell
      grid via exact min-max scaling (one tiny aggregate, broadcast);
    - ``z``: 16-bit Morton interleave of (xg, yg);
    - ``z_bucket``: top ``bucket_bits`` bits of z — the file id under a
      z-ordered layout (64 files at the default);
    - ``x_bucket``/``y_bucket``: file ids under single-dimension sorted
      layouts at the SAME file count, the comparison baselines.

    Scale shape: one NULL-filtering scan, one 4-value min-max aggregate
    joined back via broadcast, then pure map-side arithmetic — no shuffle
    of the big table at all (the *write* would shuffle once on z via
    repartitionByRange; the analysis does not need to).

    Rows with NULL key or NULL timestamp carry no layout information and
    fail the row, not the job (cleanvec doctrine).
    """
    # Same FILE COUNT for every layout (2^bucket_bits), or the comparison
    # is rigged: z buckets take the top bucket_bits of the 16-bit z-value;
    # single-dimension buckets take the top bucket_bits of the 8-bit grid
    # coordinate (so bucket_bits must be <= GRID_BITS for the baselines).
    shift = 2 * GRID_BITS - bucket_bits
    dshift = max(GRID_BITS - bucket_bits, 0)
    ev = events.where(
        F.col(x_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(x_col).cast("long").alias("__x"),
        _hour_index(ts_col).alias("__y"),
    )
    stats = ev.agg(
        F.min("__x").alias("__xmin"),
        F.max("__x").alias("__xmax"),
        F.min("__y").alias("__ymin"),
        F.max("__y").alias("__ymax"),
    )
    # Exact min-max normalization onto the integer grid — see
    # grid_expr_sql for the overflow-guarded hybrid formula and its
    # cross-engine division-semantics contract. Residual documented
    # limit: a RANGE wider than int64 (xmin near -2^63 AND xmax near
    # 2^63) overflows the subtraction, loudly under ANSI; partition such
    # keys before layout planning.
    g = ev.join(F.broadcast(stats)).select(
        F.expr(grid_expr_sql("__x", "__xmin", "__xmax")).alias("xg"),
        F.expr(grid_expr_sql("__y", "__ymin", "__ymax")).alias("yg"),
    )
    z = morton16(F.col("xg"), F.col("yg"))
    return g.select(
        "xg",
        "yg",
        z.alias("z"),
        F.shiftright(z, shift).cast("long").alias("z_bucket"),
        F.shiftright(F.col("xg"), dshift).cast("long").alias("x_bucket"),
        F.shiftright(F.col("yg"), dshift).cast("long").alias("y_bucket"),
    )


def zorder_bucket_stats(events: DataFrame, **kw) -> DataFrame:
    """Per-z-bucket layout quality report: row count and the bucket's
    bounding rectangle in grid space. Tight rectangles (small spans in
    BOTH dimensions) are what make min-max pruning effective; a
    single-dimension sort would show span ~= GRID in the other dimension.
    One hash shuffle on the ~64-value bucket key; everything upstream is
    map-side."""
    g = zorder_frame(events, **kw)
    return g.groupBy("z_bucket").agg(
        F.count("*").alias("n_rows"),
        F.min("xg").alias("x_lo"),
        F.max("xg").alias("x_hi"),
        F.min("yg").alias("y_lo"),
        F.max("yg").alias("y_hi"),
    )


def zorder_compaction_plan(
    events: DataFrame,
    id_col: str = "event_id",
    x_col: str = "user_id",
    ts_col: str = "ts",
    bucket_bits: int = 6,
    delta_mod: int = 10,
    rewrite_pct: int = 10,
) -> DataFrame:
    """Incremental z-order maintenance: which file buckets must be
    REWRITTEN to absorb a delta batch, and which can defer.

    The operational companion of :func:`zorder_bucket_stats` — what Delta
    Lake's incremental ``OPTIMIZE`` and Iceberg's rewrite-data-files
    action decide. The existing layout's grid is FROZEN when its files
    were written, so arrivals are mapped onto the base min-max grid and
    clamped into it (an arrival outside the historical range lands in the
    edge bucket — it cannot invent a new grid without rewriting
    everything). Per bucket, the plan compares delta pressure to base
    size: ``rewrite`` when delta rows exceed ``rewrite_pct`` percent of
    base rows (or the bucket is all-new), else ``defer`` (the delta rides
    in a small side file until pressure accumulates).

    The base/delta split here is deterministic for testability —
    ``id % delta_mod == 0`` is the delta batch — standing in for "files
    ingested since the last OPTIMIZE"; production callers pass any
    predicate by pre-tagging. Decision inputs are bucket-level COUNTS
    only: one tiny min-max aggregate + one hash shuffle on the 64-value
    bucket key. The plan never rereads or shuffles row data — that is
    what makes the decide step cheap enough to run per ingest cycle at
    100 TB.

    An empty base means there is no layout to maintain (the correct plan
    is an initial z-order WRITE, not a compaction): the plan is empty.
    NULL key/timestamp/id rows carry no layout information and fail the
    row (cleanvec doctrine).
    """
    shift = 2 * GRID_BITS - bucket_bits
    ev = events.where(
        F.col(x_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).select(
        F.col(x_col).cast("long").alias("__x"),
        _hour_index(ts_col).alias("__y"),
        (F.pmod(F.col(id_col), F.lit(delta_mod)) == 0).alias("__is_delta"),
    )
    base_stats = ev.where(~F.col("__is_delta")).agg(
        F.min("__x").alias("__xmin"),
        F.max("__x").alias("__xmax"),
        F.min("__y").alias("__ymin"),
        F.max("__y").alias("__ymax"),
    )
    g = (
        ev.join(F.broadcast(base_stats))
        # empty base -> NULL grid -> no plan (initial write, not compaction)
        .where(F.col("__xmin").isNotNull())
        .select(
            "__is_delta",
            # Frozen-grid mapping: the INPUT is clamped into the base
            # [vmin, vmax] BEFORE gridding, so an out-of-range delta key
            # lands in the edge bucket without ever entering the grid
            # arithmetic. Clamping after would be too late: the stretch
            # branch is chosen from the BASE range, and an extreme delta
            # key (e.g. near 2^62 over a narrow base) would overflow
            # (v - vmin) * GRID in int64 — a job-killing error under
            # ANSI, a silent wrong bucket without it. Input clamping
            # also keeps the numerator non-negative, so truncating div
            # (Spark) and DuckDB's // agree with no dialect caveat; the
            # clamped value never exceeds vmax, so both branches provably
            # land in [0, GRID-1] with no output clamp needed.
            F.expr(
                grid_expr_sql(
                    "least(greatest(__x, __xmin), __xmax)", "__xmin", "__xmax"
                )
            ).alias("xg"),
            F.expr(
                grid_expr_sql(
                    "least(greatest(__y, __ymin), __ymax)", "__ymin", "__ymax"
                )
            ).alias("yg"),
        )
    )
    b = g.select(
        "__is_delta",
        F.shiftright(morton16(F.col("xg"), F.col("yg")), shift)
        .cast("long")
        .alias("z_bucket"),
    )
    plan = b.groupBy("z_bucket").agg(
        F.count(F.when(~F.col("__is_delta"), 1)).alias("base_rows"),
        F.count(F.when(F.col("__is_delta"), 1)).alias("delta_rows"),
    )
    return plan.select(
        "z_bucket",
        "base_rows",
        "delta_rows",
        F.when(
            (F.col("base_rows") == 0)
            | (F.col("delta_rows") * 100 >= F.col("base_rows") * rewrite_pct),
            F.lit("rewrite"),
        )
        .otherwise(F.lit("defer"))
        .alias("action"),
    )


def zorder_write(
    events: DataFrame,
    path: str,
    x_col: str = "user_id",
    ts_col: str = "ts",
    bucket_bits: int = 6,
    payload_cols: tuple[str, ...] = ("event_id",),
) -> None:
    """Materialize the z-ordered physical layout :func:`zorder_frame`
    analyzes: annotate rows with their grid coordinates and z-bucket,
    then write parquet PARTITIONED BY z_bucket with exactly one file per
    bucket — the write step of Delta's ``OPTIMIZE ZORDER BY`` expressed
    as plain repartition + partitionBy.

    ``repartition(z_bucket)`` hash-colocates each bucket into one task
    (the table's ONE shuffle), and ``partitionBy`` then splits each
    task's output per bucket directory — yielding 2^bucket_bits files,
    each covering one 32x32 grid tile, so a rectangle probe prunes at
    the DIRECTORY level before a single row group is opened
    (:func:`zorder_probe_scan`). At 100 TB the same plan holds with
    ``repartitionByRange(z)`` + more files per bucket; one file per
    bucket here keeps the file arithmetic exactly testable.

    Rows with NULL key or timestamp carry no layout position and fail
    the row (cleanvec doctrine), like every layout entry.
    """
    shift = 2 * GRID_BITS - bucket_bits
    keep = [F.col(c) for c in payload_cols]
    ev = events.where(
        F.col(x_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        *keep,
        F.col(x_col).cast("long").alias("__x"),
        _hour_index(ts_col).alias("__y"),
    )
    stats = ev.agg(
        F.min("__x").alias("__xmin"),
        F.max("__x").alias("__xmax"),
        F.min("__y").alias("__ymin"),
        F.max("__y").alias("__ymax"),
    )
    g = ev.join(F.broadcast(stats)).select(
        *keep,
        F.expr(grid_expr_sql("__x", "__xmin", "__xmax")).alias("xg"),
        F.expr(grid_expr_sql("__y", "__ymin", "__ymax")).alias("yg"),
    )
    out = g.select(
        *keep,
        "xg",
        "yg",
        F.shiftright(morton16(F.col("xg"), F.col("yg")), shift)
        .cast("long")
        .alias("z_bucket"),
    )
    # Pin the exchange width to the bucket count: a keyless-N
    # repartition("z_bucket") is AQE-coalescible, and on a small input the
    # coalesced single task writes all 2^bucket_bits directories
    # SEQUENTIALLY (per-dir writer open/compress/commit dominates —
    # measured min-of-4 1.0 s pinned vs 1.5 s coalesced at sf0.1).
    # Layout is identical either way: hash(z_bucket) still puts each
    # bucket's rows in exactly one task ⇒ one file per bucket.
    out.repartition(2 ** bucket_bits, "z_bucket").write.mode(
        "overwrite"
    ).partitionBy("z_bucket").parquet(path)


def _py_spread8(v: int) -> int:
    v &= 0xFF
    v = (v | (v << 4)) & 0x0F0F
    v = (v | (v << 2)) & 0x3333
    v = (v | (v << 1)) & 0x5555
    return v


def probe_buckets(
    x_range: tuple[int, int], y_range: tuple[int, int], bucket_bits: int = 6
) -> list[int]:
    """The z-buckets a rectangle probe must open — the candidate set a
    min-max/partition-pruned scan enumerates BEFORE touching data. Pure
    driver-side arithmetic over the probe rectangle's grid cells (≤
    GRID² iterations of the same Morton kernel the layout was written
    with), so the pruning decision costs zero cluster work."""
    shift = 2 * GRID_BITS - bucket_bits
    return sorted(
        {
            (_py_spread8(x) | (_py_spread8(y) << 1)) >> shift
            for x in range(x_range[0], x_range[1] + 1)
            for y in range(y_range[0], y_range[1] + 1)
        }
    )


#: Probe rectangles for the pruning report, in grid cells: an eighth of
#: each dimension's range, off-center so they do not degenerate to bucket
#: boundaries. A file layout is graded by how many DISTINCT buckets (files)
#: contain at least one matching row — the scan cost of the probe.
PROBE_X = (64, 95)
PROBE_Y = (160, 191)


def zorder_probe_scan(
    spark,
    path: str,
    x_range: tuple[int, int] = PROBE_X,
    y_range: tuple[int, int] = PROBE_Y,
    bucket_bits: int = 6,
    sum_col: str = "event_id",
) -> DataFrame:
    """Rectangle probe against a table :func:`zorder_write` materialized:
    restrict the scan to the probe's candidate z-buckets (partition-
    directory pruning — the physical realization of what
    :func:`zorder_pruning_gain` predicts), then apply the exact
    rectangle row filter and aggregate.

    One row out: matching row count, exact int64 payload sum (the
    roundtrip-integrity witness), the files the pruned scan opened
    (candidate buckets present in the table — each bucket is one file by
    construction), and the table's total file count. The bucket filter
    is an IN over driver-computed literals, so Spark prunes partition
    directories at PLANNING time — ``tests/test_layout.py`` asserts the
    physical ``inputFiles()`` shrink, closing the predict-vs-actual loop.

    The read supplies an explicit schema: an empty table (nothing
    survived the NULL filter at write time) must still scan as the
    schema-correct empty frame instead of failing inference.
    ``files_total`` comes from listing the partition directories —
    catalog METADATA, not a second data scan (a cluster would ask the
    metastore/manifest the same question) — so the only table scan in
    the plan is the pruned one. The listing goes through the Hadoop
    FileSystem API, so any URI the write accepted (local, hdfs://,
    s3a://) lists the same way — ``os.listdir`` would bind the probe to
    the local filesystem the docstring's 100 TB posture rules out.
    """
    cand = probe_buckets(x_range, y_range, bucket_bits)
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    files_total = sum(
        1
        for st in fs.listStatus(jpath)
        if st.getPath().getName().startswith("z_bucket=")
    )
    schema = f"{sum_col} long, xg long, yg long, z_bucket long"
    t = spark.read.schema(schema).parquet(path)
    pruned = t.where(F.col("z_bucket").isin(cand))
    in_rect = F.col("xg").between(*x_range) & F.col("yg").between(*y_range)
    return pruned.agg(
        F.count(F.when(in_rect, 1)).alias("n_rows"),
        F.sum(F.when(in_rect, F.col(sum_col))).alias("sum_payload"),
        F.count_distinct("z_bucket").cast("long").alias("files_scanned"),
    ).withColumn("files_total", F.lit(files_total).cast("long"))


def zorder_pruning_gain(events: DataFrame, **kw) -> DataFrame:
    """One-row scan-pruning comparison of three physical layouts (z-order
    vs key-sorted vs time-sorted, same file count) under three probe
    shapes (key-range, time-range, key x time rectangle).

    ``files_hit = count(DISTINCT bucket) among matching rows`` is exactly
    the number of files a min-max-pruned scan must open. The expected
    pattern, and the reason to z-order: the key-sorted layout is optimal
    for key probes but opens EVERY file for time probes (and vice versa),
    while z-order opens ~sqrt(files) for either single-dimension probe and
    prunes both dimensions of the rectangle probe.

    Single aggregate over the annotated frame -> 9 counters in one row;
    no shuffle of the raw table (count(DISTINCT small-int) under a
    rollup-free global agg is a two-stage partial aggregate)."""
    g = zorder_frame(events, **kw)
    in_x = F.col("xg").between(*PROBE_X)
    in_y = F.col("yg").between(*PROBE_Y)
    in_rect = in_x & in_y

    def hit(pred, bucket):
        return F.count_distinct(F.when(pred, F.col(bucket))).cast("long")

    return g.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("z_bucket").cast("long").alias("files_total"),
        hit(in_x, "z_bucket").alias("z_key_probe"),
        hit(in_y, "z_bucket").alias("z_time_probe"),
        hit(in_rect, "z_bucket").alias("z_rect_probe"),
        hit(in_x, "x_bucket").alias("keysort_key_probe"),
        hit(in_y, "x_bucket").alias("keysort_time_probe"),
        hit(in_rect, "x_bucket").alias("keysort_rect_probe"),
        hit(in_x, "y_bucket").alias("timesort_key_probe"),
        hit(in_y, "y_bucket").alias("timesort_time_probe"),
        hit(in_rect, "y_bucket").alias("timesort_rect_probe"),
    )
