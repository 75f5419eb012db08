"""Scale smoke: ~10-30x bench-scale on SYNTHESIZED data (spark.range — no
driver-side rows, no fixture files). These don't verify values (the oracle
suite does that at sf0.01); they verify the operators' PLANS survive volume:
no collect loops, no single-partition funnels, no quadratic pair blowups.
"""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_EVENTS = 5_000_000
N_USERS = 100_000


def _synth_events(spark, n=N_EVENTS):
    # deterministic pseudo-random timestamps spread over ~58 days
    base_us = 1_700_000_000_000_000
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % N_USERS).alias("user_id"),
        F.timestamp_micros(
            F.lit(base_us) + (F.abs(F.xxhash64("id")) % F.lit(5_000_000)) * F.lit(1_000_000)
        ).alias("ts"),
        (F.abs(F.xxhash64("id", F.lit(1))) % 10_000 / 100.0).alias("value"),
    )


def test_sessionize_5m_rows(spark):
    ev = _synth_events(spark)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.col("ts").cast("long")).over(w)
    lagged = ev.withColumn(
        "new_session",
        F.when(prev.isNull() | (F.col("ts").cast("long") - prev > 1800), 1).otherwise(0),
    )
    # one shuffle total: window + groupBy share the user_id partitioning
    sessions = lagged.groupBy("user_id").agg(F.sum("new_session").alias("n"))
    assert sessions.count() == N_USERS
    plan = sessions._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_windowed_agg_5m_rows(spark):
    from auto_vectordb_spark.streaming.pipeline import windowed_event_counts

    ev = _synth_events(spark)
    out = windowed_event_counts(ev, key_col="user_id", window="1 day")
    assert out.count() > 0


def test_asof_join_2m_rows_linear(spark):
    from auto_vectordb_spark.operators.relational import asof_join

    ev = _synth_events(spark, 2_000_000)
    left = ev.filter(F.col("event_id") % 2 == 0).select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_id") % 2 == 1).select("user_id", "ts", "value")
    out = asof_join(left, right, "user_id", right_value_cols=["value"])
    # linear: output rows == left rows (one match column per left row)
    assert out.count() == 1_000_000


def test_exact_dedup_1m_docs(spark):
    from auto_vectordb_spark.operators.dedup import exact_dedup

    docs = spark.range(1_000_000).select(
        F.col("id").alias("doc_id"),
        # 100k distinct texts -> every content group has ~10 members
        F.concat(F.lit("doc text "), (F.col("id") % 100_000).cast("string")).alias("text"),
    )
    out = exact_dedup(docs)
    assert out.count() == 100_000
    assert out.agg(F.sum("n_dups")).collect()[0][0] == 1_000_000
