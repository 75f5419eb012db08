"""Streaming extensions: batch/stream parity, idempotent foreachBatch merge."""

import uuid

from pyspark.sql import functions as F

from auto_vectordb_spark.plans.parity import _fix_nanos
from auto_vectordb_spark.streaming.pipeline import (
    foreach_batch_index_merge,
    run_stream_to_memory,
    stream_files,
    windowed_event_counts,
)


def _events_batch(spark, sf_dir):
    return _fix_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))


def test_stream_equals_batch(spark, sf_dir):
    """The SAME windowed aggregation over file-stream and batch must agree."""
    batch = windowed_event_counts(_events_batch(spark, sf_dir))
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = _fix_nanos(stream_files(spark, sf_dir, raw_schema, glob="events.parquet"))
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = run_stream_to_memory(windowed_event_counts(stream), name)
    q.stop()
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table(name).collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert got == want


def test_watermark_present_in_stream_plan(spark, sf_dir):
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = _fix_nanos(stream_files(spark, sf_dir, raw_schema, glob="events.parquet"))
    agg = windowed_event_counts(stream, watermark="2 hours")
    assert agg.isStreaming


def test_foreach_batch_merge_idempotent(spark, tmp_path):
    """Replayed micro-batches must not duplicate ids in the sink."""
    src_dir, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], ["id", "v"]
    )
    df.write.parquet(src_dir)
    sink: dict[str, int] = {}

    def write_fn(batch, epoch):
        for r in batch.collect():
            sink[r["id"]] = sink.get(r["id"], 0) + 1

    stream = spark.readStream.schema(df.schema).parquet(src_dir)
    q = foreach_batch_index_merge(stream, write_fn, ckpt)
    q.processAllAvailable()
    q.stop()
    # duplicate id 'a' collapsed inside the batch before write_fn
    assert sink == {"a": 1, "b": 1}


def test_streaming_ingest_chunks_path(spark, tmp_path):
    """Incremental ingest: new parquet files under a dir flow through the
    same chunk derivation as batch (one code path, SURVEY §3.1)."""
    from auto_vectordb_spark.schema import CHUNK_SCHEMA, derive_chunks

    src_dir = str(tmp_path / "docs")
    docs = spark.createDataFrame(
        [(1, "hello world", "uploaded/cat1/f.pdf")], ["doc_id", "text", "source"]
    )
    docs.write.parquet(src_dir)
    stream = spark.readStream.schema(docs.schema).parquet(src_dir)
    chunks = derive_chunks(stream, timestamp="2024-06-01 00:00:00")
    assert chunks.isStreaming
    assert [f.name for f in chunks.schema.fields] == [f.name for f in CHUNK_SCHEMA.fields]
    name = f"ing_{uuid.uuid4().hex[:8]}"
    q = (
        chunks.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.table(name).collect()
    assert len(out) == 1 and out[0]["lv1_cat"] == "cat1"
