"""Gates for the profiling operators (operators/profiling.py): profile
exactness against hand-computed stats, null accounting, shard-share
algebra, and the approx-NDV scale path."""

import pytest
from pyspark.sql import functions as F

from auto_vectordb_spark.operators import profiling as PF
from auto_vectordb_spark.plans.parity import load_views


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    return load_views(spark, sf_dir)


def test_table_profile_matches_direct_aggregates(spark, tables):
    docs = tables["documents"]
    prof = {r["col_name"]: r for r in PF.table_profile(docs).collect()}
    assert set(prof) == {"doc_id", "text", "lang", "source", "n_chars"}
    n = docs.count()
    direct = docs.agg(
        F.countDistinct("lang").alias("ndv_lang"),
        F.min(F.col("doc_id").cast("string")).alias("min_id"),
        F.sum(F.length("text")).alias("len_text"),
    ).collect()[0]
    for c in prof:
        assert prof[c]["n_rows"] == n
        assert prof[c]["n_null"] == 0  # fixture has no nulls
    assert prof["lang"]["n_distinct"] == direct["ndv_lang"]
    assert prof["doc_id"]["n_distinct"] == n
    assert prof["doc_id"]["min_val"] == direct["min_id"]
    assert prof["text"]["sum_len"] == direct["len_text"]


def test_table_profile_counts_nulls_and_survives_them(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], ["id", "v"]
    )
    prof = {r["col_name"]: r for r in PF.table_profile(df).collect()}
    assert prof["v"]["n_null"] == 2
    assert prof["v"]["n_distinct"] == 1
    assert prof["v"]["min_val"] == "a" and prof["v"]["max_val"] == "a"
    assert prof["v"]["sum_len"] == 1  # nulls contribute no length
    assert prof["id"]["n_null"] == 0


def test_table_profile_approx_mode_close(spark, tables):
    docs = tables["documents"]
    exact = {r["col_name"]: r["n_distinct"] for r in PF.table_profile(docs).collect()}
    approx = {
        r["col_name"]: r["n_distinct"]
        for r in PF.table_profile(docs, exact=False).collect()
    }
    for c, e in exact.items():
        assert abs(approx[c] - e) <= max(2, 0.1 * e), (c, e, approx[c])


def test_shard_skew_shares_sum_to_one_and_partition_all_docs(spark, tables):
    docs = tables["documents"]
    rows = PF.shard_skew(docs, n_shards=16).collect()
    assert 1 <= len(rows) <= 16
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert sum(r["sum_weight"] for r in rows) == (
        docs.agg(F.sum("n_chars")).collect()[0][0]
    )
    assert abs(sum(r["doc_share"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["weight_share"] for r in rows) - 1.0) < 1e-9
    # MD5-based assignment should actually spread a uniform id space
    assert len(rows) == 16


def test_length_percentiles_match_python_type1_quantiles(spark, tables):
    import math

    docs = tables["documents"]
    out = {r["source"]: r for r in PF.length_percentiles(docs).collect()}
    rows = docs.select("source", "n_chars", "doc_id").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append((r["n_chars"], r["doc_id"]))
    assert set(out) == set(by_src)
    for src, vals in by_src.items():
        vals.sort()
        n = len(vals)
        got = out[src]
        assert got["n"] == n and got["max_v"] == vals[-1][0]
        for p in (25, 50, 75, 95):
            assert got[f"p{p}"] == vals[math.ceil(p * n / 100) - 1][0], (src, p)


def test_length_percentiles_nulls_rank_last_matching_duckdb(spark):
    import duckdb

    rows = [(1, "g", None), (2, "g", 5), (3, "g", 9), (4, "g", 1)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = PF.length_percentiles(df).collect()[0]
    # DuckDB (the oracle dialect) puts NULLs LAST under ASC; the operator
    # must match — a NULL value must never poison a low percentile
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT * FROM (VALUES " +
                ", ".join(f"({i}, 'g', {'NULL' if c is None else c})" for i, _, c in rows) +
                ") t(doc_id, source, n_chars)")
    want = con.execute("""
      WITH r AS (SELECT n_chars AS v,
                        row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
                        count(*) OVER () AS n
                 FROM d)
      SELECT max(CASE WHEN rn <= (25*n+99)//100 THEN v END),
             max(CASE WHEN rn <= (50*n+99)//100 THEN v END),
             max(CASE WHEN rn <= (95*n+99)//100 THEN v END)
      FROM r""").fetchone()
    assert (got["p25"], got["p50"], got["p95"]) == want
    assert got["p25"] == 1 and got["p50"] == 5  # NULL did not rank first
    assert got["n"] == 4
