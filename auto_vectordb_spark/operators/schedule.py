"""Training-schedule planning: curriculum stages and balanced shard orders.

What a pretraining run consumes is not a TABLE but an ORDER: curriculum
learning feeds easy/clean text first, and balanced sharding keeps every
shard's difficulty/language mix stationary so per-shard gradient
statistics do not drift as the run walks the shards. Both reduce to the
same primitive — an EXACT global rank of every document under a total
order — which naively is a full sort into one partition, the classic
scale-killer.

:func:`global_rank` computes the exact rank without a global sort, the
pattern proven by the ``events_ntile`` registry entry (plans/parity.py):
approximate percentile boundaries split the leading sort key into
contiguous value ranges (boundary placement affects only bucket BALANCE,
never rank correctness, so approx_percentile's nondeterminism is
harmless), per-range ranks run as parallel windows, and the tiny
per-range counts come back as broadcast prefix offsets: global rank =
local rank + range offset. One hash shuffle on the range key; the only
driver-sized data is the ~n_buckets-row offset table.

On top of it:

- :func:`curriculum_stages` — SQL-``ntile(K)`` difficulty stages over a
  quality score (stage 1 = lowest quality ... stage K = highest; a
  curriculum run consumes stages in DESCENDING stage order, cleanest
  text first) with a per-stage composition report;
- :func:`interleaved_shards` — shard = (rank-1) mod K, the round-robin
  deal over the quality order, so every shard spans the full difficulty
  spectrum with near-identical statistics (the report proves it).

Reference scope note: the reference system (kstyle2198/auto_vectordb)
has no training-schedule surface — this module is part of the
training-data-pipeline extension mandate (SURVEY.md step 8), downstream
of its quality-filter analogues.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_rank(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_buckets: int = 32,
) -> DataFrame:
    """Annotate ``df`` with the EXACT 1-based global rank ``__r`` under
    ``ORDER BY value_col, id_col`` and the total row count ``__n`` —
    without a single-partition sort.

    ``value_col`` is the leading sort key, so value-range buckets are
    contiguous runs of the global order and equal values never split
    across buckets (the strict ``>`` boundary test guarantees it). Rows
    with a NULL value or NULL id have no place in a total order and fail
    the row (cleanvec doctrine).

    Scale shape: ONE eager 1-row collect at call time (the
    approx_percentile boundary sketch, frozen into the bucket expression
    as literals — safe to freeze because boundary placement affects only
    bucket BALANCE, never rank correctness), then the returned frame is
    one hash shuffle on the range key: per-bucket row_number windows,
    per-bucket counts that RIDE that same window's exchange+sort
    (``max(__lr)`` — reused, not recomputed), the prefix offsets reduced
    through a ~n_buckets-row aggregate, and one broadcast join back.
    Counts and offsets are computed INSIDE the consumer's action, so the
    ranks are self-consistent by construction even if the underlying
    source changes or is non-deterministic between call and action —
    stale boundaries can only unbalance buckets, never corrupt ranks
    (the literal-frozen-counts variant this replaces corrupted silently
    there). Nothing is persisted: no cache outlives the call (the r9
    version parked a cached frame per call forever), and the only
    driver-sized data anywhere is the boundary row and the broadcast
    offsets table.
    """
    rows = df.where(
        F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
    )
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bvals = rows.agg(
        F.expr(
            f"approx_percentile({value_col}, "
            f"array({','.join(str(q) for q in qs)}))"
        ).alias("__b")
    ).first()["__b"]
    boundaries = list(bvals) if bvals is not None else []
    bkt = sum(
        (
            F.when(F.col(value_col) > F.lit(b), 1).otherwise(0)
            for b in boundaries
        ),
        start=F.lit(0),
    )
    w = Window.partitionBy("__bkt").orderBy(value_col, id_col)
    loc = rows.withColumn("__bkt", bkt).withColumn(
        "__lr", F.row_number().over(w).cast("long")
    )
    # Per-bucket counts as max(__lr) — the groupBy reuses the window's
    # exchange AND sort, so the expensive upstream projection is computed
    # once per action, not per branch (the reason r9 persisted).
    counts = loc.groupBy("__bkt").agg(F.max("__lr").alias("__cnt"))
    offsets = counts.agg(
        F.sort_array(F.collect_list(F.struct("__bkt", "__cnt"))).alias("a")
    ).select(
        F.explode(
            F.expr(
                "transform(a, (e, i) -> struct(e.__bkt AS __bkt, "
                "aggregate(slice(a, 1, i), CAST(0 AS BIGINT), "
                "(acc, x) -> acc + x.__cnt) AS __off))"
            )
        ).alias("e"),
        F.expr(
            "aggregate(a, CAST(0 AS BIGINT), (acc, x) -> acc + x.__cnt)"
        ).alias("__n"),
    ).select("e.__bkt", "e.__off", "__n")
    return (
        loc.join(F.broadcast(offsets), "__bkt")
        .withColumn("__r", F.col("__lr") + F.col("__off"))
        .drop("__bkt", "__lr", "__off")
    )


def ntile_expr(rank_col: str, n_col: str, k: int):
    """The exact SQL ``ntile(k)`` tile of rank ``rank_col`` among
    ``n_col`` rows: the first ``n % k`` tiles hold ``n div k + 1`` rows,
    the rest ``n div k`` — bit-identical to every engine's NTILE."""
    return F.expr(
        f"CAST(CASE WHEN {rank_col} <= ({n_col} % {k}) * ({n_col} div {k} + 1) "
        f"THEN ({rank_col} - 1) div ({n_col} div {k} + 1) + 1 "
        f"ELSE {n_col} % {k} + ({rank_col} - ({n_col} % {k}) * ({n_col} div {k} + 1) - 1) "
        f"div ({n_col} div {k}) + 1 END AS INT)"
    )


def curriculum_stages(
    scored: DataFrame,
    k: int = 8,
    quality_col: str = "quality",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    lang_col: str = "lang",
) -> DataFrame:
    """Cut a quality-scored corpus into ``k`` exact equal-depth
    difficulty stages (SQL ntile over ``ORDER BY quality, doc_id``) and
    report each stage's composition: document count, quality range,
    token budget and language diversity — the schedule a curriculum
    run consumes (descending stage = cleanest first).
    """
    ranked = global_rank(scored, quality_col, id_col)
    staged = ranked.withColumn("stage", ntile_expr("__r", "__n", k))
    return staged.groupBy("stage").agg(
        F.count("*").alias("n_docs"),
        F.min(quality_col).alias("q_lo"),
        F.max(quality_col).alias("q_hi"),
        F.sum(tokens_col).alias("sum_tokens"),
        F.count_distinct(lang_col).cast("long").alias("n_langs"),
    )


def interleaved_shards(
    scored: DataFrame,
    k: int = 8,
    quality_col: str = "quality",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    lang_col: str = "lang",
) -> DataFrame:
    """Deal the quality order round-robin into ``k`` shards
    (``shard = (rank-1) mod k``) and report per-shard statistics. The
    point is the NEAR-EQUALITY of the rows: every shard receives every
    k-th document of the difficulty order, so counts differ by at most
    one and quality sums track each other — the stationarity a training
    run needs when shards are consumed in sequence. The within-shard
    position ``(rank-1) div k`` (not emitted here) is the replayable
    curriculum order inside each shard."""
    ranked = global_rank(scored, quality_col, id_col)
    sharded = ranked.withColumn(
        "shard", ((F.col("__r") - 1) % k + 1).cast("int")
    )
    return sharded.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.round(F.col(quality_col) * 1_000_000, 0).cast("long")).alias(
            "sum_quality_6d"
        ),
        F.sum(tokens_col).alias("sum_tokens"),
        F.count_distinct(lang_col).cast("long").alias("n_langs"),
    )
