"""Catalog/DDL surface (S13-S16): create/list/drop with identifier validation."""

import pytest

from auto_vectordb_spark import catalog as C


def test_create_list_drop_roundtrip(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "v"])
    C.drop_table(spark, "t_cat_test")
    C.create_table(spark, "t_cat_test", df)
    assert C.table_exists(spark, "t_cat_test")
    assert "t_cat_test" in C.list_tables(spark)
    assert spark.table("t_cat_test").count() == 1
    C.drop_table(spark, "t_cat_test")
    assert not C.table_exists(spark, "t_cat_test")


def test_create_errors_if_exists(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    C.drop_table(spark, "t_cat_dup")
    C.create_table(spark, "t_cat_dup", df)
    with pytest.raises(Exception):
        C.create_table(spark, "t_cat_dup", df)
    C.drop_table(spark, "t_cat_dup")


def test_identifier_validation_blocks_injection(spark):
    """The reference f-string-interpolates identifiers into SQL (postgres.py:79,
    SURVEY §2.11) — ours must reject anything that isn't a bare identifier."""
    for bad in ["t; DROP TABLE x", "t'--", "a.b", "1tab", ""]:
        with pytest.raises(ValueError):
            C.drop_table(spark, bad)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Join of two tables bucketed on the same key must plan with ZERO
    shuffles (SortMergeJoin over bucketed scans)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    for t in ("b_orders", "b_lineitem"):
        C.drop_table(spark, t)
    C.create_bucketed_table(spark, "b_orders", orders, "o_orderkey", 8, "o_orderkey")
    C.create_bucketed_table(
        spark, "b_lineitem", lineitem, "l_orderkey", 8, "l_orderkey"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path: at test scale the planner would rather
        # broadcast (and skip bucketing entirely); real fact-to-fact joins
        # can't broadcast, which is exactly when bucketing pays
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = (
            spark.table("b_lineitem")
            .join(
                spark.table("b_orders"),
                spark.table("b_lineitem")["l_orderkey"]
                == spark.table("b_orders")["o_orderkey"],
            )
            .select("l_orderkey", "o_totalprice", "l_quantity")
        )
        assert j.count() > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        C.drop_table(spark, "b_orders")
        C.drop_table(spark, "b_lineitem")
