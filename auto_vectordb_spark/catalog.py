"""Catalog / DDL surface (reference S13–S16).

The reference hand-builds CREATE/DROP/list SQL against Postgres and MariaDB
(/root/reference/backend/process/postgres.py:40-146, maria.py:42-133) and
manages ES indices (backend/process/elasticsearch_index.py:51-63,308-350).
Spark's catalog subsumes all of it; identifiers are validated against the
catalog instead of f-string-interpolated into SQL (reference defect,
postgres.py:79 — see SURVEY §2.11).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_ident(name: str) -> str:
    if not _IDENT.match(name):
        raise ValueError(f"invalid table identifier: {name!r}")
    return name


def create_table(spark: SparkSession, name: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
    """S14 — CREATE TABLE (parquet-backed managed table)."""
    writer = df.write.mode("errorifexists").format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(_check_ident(name))


def drop_table(spark: SparkSession, name: str) -> None:
    """S15 — DROP TABLE IF EXISTS."""
    spark.sql(f"DROP TABLE IF EXISTS {_check_ident(name)}")


def list_tables(spark: SparkSession, database: str | None = None) -> list[str]:
    """S13/S16-list — ordered table names (reference ORDER BY table_name)."""
    return sorted(t.name for t in spark.catalog.listTables(database))


def table_exists(spark: SparkSession, name: str) -> bool:
    return spark.catalog.tableExists(_check_ident(name))


def create_bucketed_table(
    spark: SparkSession,
    name: str,
    df: DataFrame,
    bucket_by: str,
    num_buckets: int = 32,
    sort_by: str | None = None,
) -> None:
    """Bucketed managed table — pre-shuffled storage for co-located joins.

    Two tables bucketed on the same key/count join WITHOUT any exchange
    (verified in tests): at 100 TB this converts every recurring
    fact-to-fact join on the bucket key from a full shuffle into a local
    zipper. The write pays one shuffle once; every downstream join rides it.
    """
    writer = df.write.mode("errorifexists").format("parquet").bucketBy(
        num_buckets, bucket_by
    )
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(_check_ident(name))
