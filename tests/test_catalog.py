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
