"""Relational surface of the reference (§2.2 P1–P4, §2.4 A1–A3, §2.6 O1–O3).

All thin wrappers over Catalyst operators — they exist to (a) pin the exact
reference semantics in one place and (b) give the test-suite/oracle a stable
import surface. Each docstring cites the reference implementation it
re-expresses.

Scale notes: every function here compiles to a plan where filters and
projections push down to the parquet scan (verified in tests via
``explain``); `top_k` uses TakeOrderedAndProject (no global sort); deletes
are expressed as anti-joins, which Spark runs broadcast when the id set is
small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def filter_eq(df: DataFrame, column: str, value) -> DataFrame:
    """P1/P2 — equality filter.

    Reference: ``SELECT * FROM t WHERE hashed_filepath = %s``
    (backend/process/postgres.py:321-341) and the ES term query
    (backend/process/elasticsearch_index.py:182-189). Pushed to the scan.
    """
    return df.filter(F.col(column) == value)


def project(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """P3 — column projection (postgres.py:343-363). Prunes the scan."""
    return df.select(*columns)


def distinct_values(df: DataFrame, column: str) -> DataFrame:
    """A1 — distinct single column (postgres.py:356 uses a Python set)."""
    return df.select(column).distinct()


def count_rows(df: DataFrame) -> int:
    """A2 — row count (routers/pg_rdb.py:154, parsing.py:238-243)."""
    return df.count()


def delete_by_ids(df: DataFrame, id_col: str, ids: Sequence) -> DataFrame:
    """P4 — point delete (postgres.py:365-400), as an anti-filter.

    For a handful of ids this is a pushed-down NOT-IN filter; for a large id
    DataFrame use :func:`delete_by_df` (broadcast anti-join).
    """
    return df.filter(~F.col(id_col).isin(list(ids)))


def delete_by_df(df: DataFrame, ids: DataFrame, id_col: str) -> DataFrame:
    """P4 at scale — anti-join against an id DataFrame (broadcast if small)."""
    return df.join(F.broadcast(ids), on=id_col, how="left_anti")


def sort_limit(df: DataFrame, order_by: str = "id", limit: int | None = 10) -> DataFrame:
    """O1 — ``SELECT * FROM t ORDER BY {order_by} LIMIT n`` (postgres.py:
    292-319; default order 'id', limit 10, unlimited when None). Spark plans
    TakeOrderedAndProject — per-partition top-n, no global sort."""
    out = df.orderBy(order_by)
    return out if limit is None else out.limit(limit)


def top_k(df: DataFrame, score: Column | str, k: int, tie_break: str | None = None) -> DataFrame:
    """O3 — global top-k by score desc with deterministic tie-break
    (ES relevance ordering, elasticsearch_index.py:235-246; ties broken
    score DESC, id ASC per FIXTURES.md)."""
    score_col = F.col(score) if isinstance(score, str) else score
    order = [score_col.desc()] + ([F.col(tie_break).asc()] if tie_break else [])
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    score: Column | str,
    k: int,
    tie_break: str | None = None,
    ascending: bool = False,
) -> DataFrame:
    """Windowed top-k per group (our implementation of per-query retrieval,
    SURVEY §2.8 V2/O3). One shuffle on the group key; rank prunes early.
    ``ascending=True`` ranks smallest-first (distance metrics)."""
    score_col = F.col(score) if isinstance(score, str) else score
    ordered = score_col.asc() if ascending else score_col.desc()
    order = [ordered] + ([F.col(tie_break).asc()] if tie_break else [])
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def idempotent_dedup(df: DataFrame, id_col: str = "id") -> DataFrame:
    """§2.7 — ES ``_id`` overwrite semantics (elasticsearch_index.py:141):
    re-indexing the same id is an upsert, not a duplicate."""
    return df.dropDuplicates([id_col])


def merge_upsert(
    existing: DataFrame,
    updates: DataFrame,
    id_col: str = "id",
    version_col: str = "updated_at",
) -> DataFrame:
    """Latest-wins upsert — the engine's MERGE (reference semantics: ES
    ``_id`` overwrite on re-index, elasticsearch_index.py:141; Postgres has
    no upsert in the reference, it just re-inserts).

    Union both sides, keep the newest row per id (version desc, updates win
    ties). One shuffle on the id; on Delta this maps 1:1 to ``MERGE INTO``.
    """
    tagged_e = existing.withColumn("__src", F.lit(0))
    tagged_u = updates.withColumn("__src", F.lit(1))
    w = Window.partitionBy(id_col).orderBy(
        F.col(version_col).desc(), F.col("__src").desc()
    )
    return (
        tagged_e.unionByName(tagged_u)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Inner equi-join with key salting for skew (result ≡ ``big.join(small,
    key)``).

    The big side gets a random-ish (deterministic: hash of all columns)
    salt in [0, S); the small side is replicated S× with an exploded salt —
    so one hot key's rows spread over S reducers instead of one. Use when a
    single key dominates and AQE's size-based skew split isn't enough
    (e.g. the skewed side is already pre-shuffled). Replication multiplies
    the small side S× — keep it dimension-sized.
    """
    salt = (F.abs(F.xxhash64(*big.columns)) % salt_buckets).alias("__salt")
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast(b.schema["__salt"].dataType))
    out = b.join(s, [key, "__salt"])
    return out.drop("__salt")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — domain-balanced corpus mixing
    (the training-data "10% of en, 50% of de" knob).

    Membership is ``hash60(key) % 1e6 < rate_of(stratum) * 1e6`` — stable
    across runs, partitionings, and retries (unlike ``sampleBy``'s RNG), so
    a resampled 100 TB corpus is reproducible and incrementally extendable:
    re-running over new data keeps every previously selected row. Nested
    rates (5% ⊂ 10%) select nested row sets, which makes rate sweeps
    comparable.
    """
    from ..functions import hashing as H

    scale = 1_000_000
    threshold = F.lit(int(default_rate * scale))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * scale))
        ).otherwise(threshold)
    bucket = H.stable_hash60(F.col(key_col).cast("string")) % scale
    return df.filter(bucket < threshold)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: Sequence[str] = (),
) -> DataFrame:
    """Backward as-of join: for every left row, the latest right row with
    ``right_ts <= left_ts`` on the same key (DuckDB/kdb ASOF JOIN
    semantics; Spark has no native operator).

    Scale-first formulation: tag both sides, UNION, and run ONE window per
    key ordered by (ts, side) taking ``last(value, ignorenulls=True)`` —
    a single shuffle on the key, linear in rows. The naive alternative
    (range-condition join) explodes to a near-cross-join per key and is
    exactly what this operator exists to avoid. Right rows sort before left
    rows at equal timestamps, so a tie matches (<= semantics); duplicate
    right timestamps resolve to the last row in (ts) order.
    """
    lcols = left.columns
    rvals = list(right_value_cols)
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__rv_{c}") for c in rvals],
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__rv_{c}") for c in rvals],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(F.col(f"__rv_{c}"), ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in rvals
        ],
    )
    out = merged.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__m_{c}").alias(f"asof_{c}") for c in rvals],
    )
    return out


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    tolerance_us: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Range join: all (left, right) row pairs on the same key with
    ``|left_ts - right_ts| <= tolerance_us`` (timestamps in integer µs).

    Scale-safe formulation: quantize time into tolerance-wide bins; a left
    row in bin b can only match right rows in bins {b-1, b, b+1}, so the
    left side explodes 3× onto bin keys and the join is a plain equi-join
    on (key, bin) + exact filter. One shuffle each side, output-bounded —
    never the non-equi nested-loop Spark would otherwise plan (a per-key
    cross join). Returns left.* + right columns suffixed ``_r``.
    """
    bin_l = (F.col(left_ts) / F.lit(tolerance_us)).cast("long")
    bin_r = (F.col(right_ts) / F.lit(tolerance_us)).cast("long")
    l = left.withColumn(
        "__bin", F.explode(F.array(bin_l - 1, bin_l, bin_l + 1))
    ).withColumn("__k", F.col(key))
    r = right.select(
        F.col(key).alias("__k"),
        bin_r.alias("__bin"),
        *[F.col(c).alias(f"{c}_r") for c in right.columns],
    )
    joined = l.join(r, ["__k", "__bin"]).filter(
        F.abs(F.col(left_ts) - F.col(f"{right_ts}_r")) <= tolerance_us
    )
    return joined.drop("__k", "__bin")
