"""streaming/cdc.py — the changefeed apply loop: versioned rollup state
maintained by upsert+delete batches, exactly-once under replay."""

import pytest
from pyspark.sql import functions as F

from auto_vectordb_spark.operators import retraction as RT
from auto_vectordb_spark.plans.parity import load_views
from auto_vectordb_spark.streaming import cdc

SF = "/root/testdata/sf0.001"
CUTOFF = "2024-01-16 00:00:00"
EV_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


@pytest.fixture(scope="module")
def events(spark):
    return load_views(spark, SF)["events"]


def _final(df):
    return {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in RT.rollup_finalize_r(df).collect()
    }


def test_cdc_batches_equal_from_scratch_and_replay_is_noop(spark, events, tmp_path):
    state_dir = str(tmp_path / "state")
    old = events.where(F.col("ts") < CUTOFF)
    new = events.where(F.col("ts") >= CUTOFF)
    dels = old.where(F.pmod(F.col("user_id"), F.lit(41)) == 0)
    b1 = old.withColumn("op", F.lit("upsert"))
    b2 = new.withColumn("op", F.lit("upsert")).unionByName(
        dels.withColumn("op", F.lit("delete"))
    )
    cdc.apply_cdc_batch(spark, b1, state_dir, epoch=1)
    cdc.apply_cdc_batch(spark, b2, state_dir, epoch=2)
    got = _final(cdc.read_rollup_state(spark, state_dir))
    survivors = events.join(
        dels.select("event_id"), "event_id", "left_anti"
    )
    want = _final(RT.rollup_state_r(survivors))
    assert got == want and len(want) > 0
    # crash-replay of epoch 2: recomputed from the same pre-2 version -> no-op
    cdc.apply_cdc_batch(spark, b2, state_dir, epoch=2)
    assert _final(cdc.read_rollup_state(spark, state_dir)) == want


def test_cdc_stream_end_to_end(spark, events, tmp_path):
    """Real readStream: one parquet file per micro-batch
    (maxFilesPerTrigger=1), upserts in batch files 1-2, deletes riding in
    file 2 — final maintained table equals the from-scratch rollup."""
    src = str(tmp_path / "src")
    state_dir = str(tmp_path / "state2")
    ckpt = str(tmp_path / "ckpt")
    old = events.where(F.col("ts") < CUTOFF)
    new = events.where(F.col("ts") >= CUTOFF)
    dels = old.where(F.pmod(F.col("user_id"), F.lit(41)) == 0)
    old.withColumn("op", F.lit("upsert")).coalesce(1).write.parquet(f"{src}/f1")
    new.withColumn("op", F.lit("upsert")).unionByName(
        dels.withColumn("op", F.lit("delete"))
    ).coalesce(1).write.parquet(f"{src}/f2")
    schema = spark.read.parquet(f"{src}/f1").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = cdc.cdc_apply_rollup(stream, state_dir, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _final(cdc.read_rollup_state(spark, state_dir))
    survivors = events.join(dels.select("event_id"), "event_id", "left_anti")
    want = _final(RT.rollup_state_r(survivors))
    assert got == want


def test_cdc_version_pruning_keeps_replay_horizon(spark, events, tmp_path):
    state_dir = str(tmp_path / "state3")
    b = events.limit(50).withColumn("op", F.lit("upsert"))
    for e in range(1, 7):
        cdc.apply_cdc_batch(spark, b, state_dir, epoch=e, keep_versions=3)
    vs = [v for v, _ in cdc._versions(state_dir)]
    assert vs == [4, 5, 6]  # pruned to the keep-window
    # replay of the newest epoch still finds its input (epoch 5's state)
    cdc.apply_cdc_batch(spark, b, state_dir, epoch=6, keep_versions=3)
    assert [v for v, _ in cdc._versions(state_dir)] == [4, 5, 6]


def test_cdc_rejects_unknown_op(spark, events, tmp_path):
    bad = events.limit(5).withColumn("op", F.lit("merge"))
    with pytest.raises(ValueError, match="unknown CDC op"):
        cdc.apply_cdc_batch(spark, bad, str(tmp_path / "s"), epoch=1)


def test_cdc_empty_dirs_and_empty_batches(spark, events, tmp_path):
    state_dir = str(tmp_path / "state4")
    assert cdc.read_rollup_state(spark, state_dir).count() == 0
    empty = spark.createDataFrame(
        [], events.withColumn("op", F.lit("upsert")).schema
    )
    cdc.apply_cdc_batch(spark, empty, state_dir, epoch=1)
    assert cdc.read_rollup_state(spark, state_dir).count() == 0
