"""Canonical chunk schema + ingest derivation (reference §1.2).

The reference declares the same 15-column record three times
(/root/reference/backend/utils/schema.py:1-17, frontend/app.py:173-189,
backend/process/postgres.py:237-238) across four storage dialects. Here it is
ONE explicit StructType; `embeddings` is a native array<float> end-to-end —
eliminating the string-serialize/re-parse dance the reference does at
elasticsearch_index.py:84-111.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions.text import category_levels, md5_hex, normalize_path

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("page_content", T.StringType(), True),
        T.StructField("filename", T.StringType(), True),
        T.StructField("filepath", T.StringType(), True),
        T.StructField("hashed_filename", T.StringType(), True),
        T.StructField("hashed_filepath", T.StringType(), True),
        T.StructField("hashed_page_content", T.StringType(), True),
        T.StructField("page", T.StringType(), True),  # stringified int, ref fidelity
        T.StructField("lv1_cat", T.StringType(), True),
        T.StructField("lv2_cat", T.StringType(), True),
        T.StructField("lv3_cat", T.StringType(), True),
        T.StructField("lv4_cat", T.StringType(), True),
        T.StructField("embeddings", T.ArrayType(T.FloatType()), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)


def derive_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    path_col: str = "source",
    page_col: Column | None = None,
    embeddings: Column | None = None,
    deterministic_ids: bool = True,
    timestamp: str | None = None,
) -> DataFrame:
    """Map a raw document table onto CHUNK_SCHEMA (ingest stage F1–F8).

    The reference assigns uuid4 ids (parsing.py:119); for reproducible
    pipelines (and the test oracle) ``deterministic_ids`` derives the id from
    (path, doc_id) instead — uuids remain available with
    ``deterministic_ids=False``. ``timestamp``: ISO literal pinning
    created/updated_at (tests); None → current_timestamp().
    """
    path = normalize_path(F.col(path_col))
    filename = F.element_at(F.split(path, "/"), -1)
    rid = (
        md5_hex(F.concat_ws("#", path, F.col(id_col).cast("string")))
        if deterministic_ids
        else F.uuid()  # F2 (parsing.py:119) — nondeterministic, prod path
    )
    ts = F.to_timestamp(F.lit(timestamp)) if timestamp else F.current_timestamp()
    return docs.select(
        rid.alias("id"),
        F.col(text_col).alias("page_content"),
        filename.alias("filename"),
        path.alias("filepath"),
        md5_hex(filename).alias("hashed_filename"),
        md5_hex(path).alias("hashed_filepath"),
        md5_hex(F.col(text_col)).alias("hashed_page_content"),
        (page_col if page_col is not None else F.lit(0)).cast("string").alias("page"),
        *category_levels(path),
        (embeddings if embeddings is not None else F.lit(None).cast("array<float>")).alias(
            "embeddings"
        ),
        ts.alias("created_at"),
        ts.alias("updated_at"),
    )
