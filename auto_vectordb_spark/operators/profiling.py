"""Dataset profiling / operations operators.

The reference ships a catalog surface (db_handler.py: table listing, row
counts) but no column-level statistics; a 100 TB curation run needs both a
one-pass column profile (nulls, cardinality, ranges — the ANALYZE step that
feeds partition and join planning) and a shard-balance report (the skew
check run before writing a bucketed/sharded training corpus). Both are
pure DataFrame algebra.

Scale notes
-----------
- ``table_profile`` unpivots N columns into a (col_name, val) long table —
  one corpus scan regardless of column count — then aggregates per column.
  Exact ``n_distinct`` is a (col_name, val)-keyed shuffle that Spark
  rewrites into the two-phase distinct-aggregate plan (partial distinct
  map-side); at 100 TB swap ``exact=False`` to HLL ``approx_count_distinct``
  and the shuffle carries pre-merged sketches instead of values. The
  string casts keep the operator schema-agnostic (one output shape for any
  table), at the cost of per-row formatting — acceptable because profiling
  is a once-per-dataset pass, not a per-query path.
- ``shard_skew`` reduces the corpus to ≤ n_shards rows (one hash-keyed
  shuffle with map-side partial aggregation), then broadcasts the 1-row
  total for the share division — no second corpus pass, no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H


def table_profile(
    df: DataFrame, columns: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """(col_name, n_rows, n_null, n_distinct, min_val, max_val, sum_len) —
    one-pass column-level profile in long form.

    Every column is cast to string, so one output schema fits any input
    table (integer casts are digit-identical across engines; lexicographic
    min/max is portable for BMP text — the fixtures are ASCII). ``sum_len``
    is the total character count of non-null values (nulls contribute
    nothing, matching ``sum(length(v))`` semantics in ANSI SQL).

    ``exact=False`` swaps the exact distinct count for
    ``approx_count_distinct`` — the 100 TB setting; no DuckDB oracle pairs
    with it (HLL estimates are engine-specific), so the parity entry pins
    ``exact=True``.
    """
    cols = list(columns or df.columns)
    pairs: list[Column] = []
    for c in cols:
        pairs.extend([F.lit(c), F.col(c).cast("string")])
    stacked = df.select(F.stack(F.lit(len(cols)), *pairs).alias("col_name", "val"))
    ndv = (
        F.countDistinct("val") if exact else F.approx_count_distinct("val")
    ).alias("n_distinct")
    return stacked.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("val").isNull(), 1).otherwise(0)).cast("long").alias("n_null"),
        ndv,
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
        F.sum(F.length("val")).alias("sum_len"),
    )


def table_profile_sql(table: str, columns: list[str]) -> str:
    """DuckDB twin of :func:`table_profile` (exact mode) for ``table``."""
    legs = " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS val FROM {table}"
        for c in columns
    )
    return f"""
    WITH s AS ({legs})
    SELECT col_name,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           count(DISTINCT val) AS n_distinct,
           min(val) AS min_val,
           max(val) AS max_val,
           CAST(sum(length(val)) AS BIGINT) AS sum_len
    FROM s GROUP BY col_name
    """


def shard_skew(
    df: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    n_shards: int = 16,
) -> DataFrame:
    """(shard, n_docs, sum_weight, doc_share, weight_share) — balance report
    for a hash-sharded write layout.

    Shard assignment is the portable 60-bit MD5 hash mod ``n_shards`` —
    the same function a sharded sink would use, so the report predicts the
    REAL layout, not a proxy. Shares are unrounded int/int divisions
    (bit-exact cross-engine); skew shows up as doc_share far from
    1/n_shards. The totals join broadcasts a 1-row aggregate of the
    ≤ n_shards-row reduced table.
    """
    shard = F.pmod(H.stable_hash60(F.col(id_col).cast("string")), F.lit(n_shards))
    per = df.groupBy(shard.alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(weight_col)).alias("sum_weight"),
    )
    tot = per.agg(
        F.sum("n_docs").alias("t_docs"), F.sum("sum_weight").alias("t_weight")
    )
    return per.join(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "sum_weight",
        (F.col("n_docs") / F.col("t_docs")).alias("doc_share"),
        (F.col("sum_weight") / F.col("t_weight")).alias("weight_share"),
    )


def shard_skew_sql(
    table: str, id_col: str = "doc_id", weight_col: str = "n_chars", n_shards: int = 16
) -> str:
    """DuckDB twin of :func:`shard_skew` for ``table``."""
    h = H.stable_hash60_sql(f"CAST({id_col} AS VARCHAR)")
    return f"""
    WITH per AS (
      SELECT ({h}) % {n_shards} AS shard,
             count(*) AS n_docs,
             CAST(sum({weight_col}) AS BIGINT) AS sum_weight
      FROM {table} GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS t_docs,
             CAST(sum(sum_weight) AS BIGINT) AS t_weight
      FROM per
    )
    SELECT shard, n_docs, sum_weight,
           CAST(n_docs AS DOUBLE) / t_docs AS doc_share,
           CAST(sum_weight AS DOUBLE) / t_weight AS weight_share
    FROM per CROSS JOIN tot
    """


def length_percentiles(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """(group, n, p25, p50, p75, p95, max_v) — exact discrete percentiles
    of a value column per group (the pXX = value at rank ⌈p·n⌉ under
    (value, id) order — the deterministic type-1 quantile, integer
    arithmetic only, no interpolation).

    The length-distribution profile a chunking/packing planner reads per
    source (and the skew signal for maxPartitionBytes tuning). Exact
    discrete ranks — unlike approx_percentile sketches — hash identically
    in any engine; the rank cut ⌈p·n⌉ is computed as integer
    ``(p·n + 99) DIV 100``, never a float multiply.

    Scale shape: one window rank per group partition (partitioned sort,
    never global) + one groupBy. At 100 TB with million-row groups this is
    the standard per-group sort; swap to approx_percentile when sketch
    error is acceptable.
    """
    from pyspark.sql import Window

    # NULLS LAST explicitly: Spark's ASC default is NULLS FIRST while
    # DuckDB's (the oracle twin's) is NULLS LAST — left implicit, NULL
    # values would poison the LOW percentiles in Spark only
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc_nulls_last(), F.col(id_col).asc_nulls_last()
    )
    cnt = Window.partitionBy(group_col)
    r = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cnt).alias("n"),
    )

    def at(p: int):
        return F.max(
            F.when(F.col("rn") <= F.expr(f"CAST(({p} * n + 99) DIV 100 AS INT)"), F.col("v"))
        ).alias(f"p{p}")

    return r.groupBy(F.col("grp").alias(group_col)).agg(
        F.max("n").alias("n"), at(25), at(50), at(75), at(95),
        F.max("v").alias("max_v"),
    )
