"""Streaming ingest & windowed analytics.

The reference's ingest flow (files arrive → parse → embed → index,
SURVEY §3.1-3.2) is batch-only with an aspirational async layer (Celery
configured but unused, SURVEY §2.9). Here it is a first-class incremental
mode: a file source feeds the SAME column transforms as batch (one code
path), and the index merge runs in foreachBatch with dropDuplicates(id) —
idempotent under replays, matching ES _id overwrite semantics.

Windowed/sessionized event analytics are the streaming-native extensions a
training-data pipeline needs (event-log hygiene, rate monitoring).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def stream_files(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    glob: str | None = None,
) -> DataFrame:
    """Incremental file source — new files under ``path`` (a directory)
    become micro-batches; ``glob`` filters filenames within it."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts+sums with late-data handling.

    Works identically on batch and streaming DataFrames (same function is the
    batch oracle in plans/parity.py via date_trunc equivalence).
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    # cent-quantized exact sum (see plans/parity.py determinism rule 1)
    val_cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(val_cents).cast("double") / 100).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_memory(df: DataFrame, name: str) -> StreamingQuery:
    """Drive a streaming DF to completion synchronously (local smoke/test)."""
    q = (
        df.writeStream.outputMode("complete" if df.isStreaming else "append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q


def foreach_batch_index_merge(
    stream: DataFrame,
    write_fn: Callable[[DataFrame, int], None],
    checkpoint: str,
) -> StreamingQuery:
    """Exactly-once-ish index maintenance: per micro-batch, the user write_fn
    receives a deduped batch (idempotent by 'id'). Checkpointing makes
    replays safe — the merge target must be idempotent, which
    dropDuplicates + overwrite-partition writes guarantee."""

    def _process(batch: DataFrame, epoch: int) -> None:
        write_fn(batch.dropDuplicates(["id"]), epoch)

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .start()
    )
