"""operators/schedule.py — distributed global rank, curriculum stages,
interleaved shards.

global_rank is the load-bearing kernel: it must reproduce the exact
single-partition ``row_number() OVER (ORDER BY value, id)`` while never
computing one. The tests compare it against a local sort (the definition)
including adversarial value distributions that break naive range
bucketing (heavy ties, constant columns), then check the schedule
semantics built on top.
"""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from auto_vectordb_spark.operators import schedule as SCH
from auto_vectordb_spark.plans.parity import load_views

SF = "/root/testdata/sf0.001"


def _ranks_equal_local_sort(spark, rows):
    df = spark.createDataFrame(rows, "id: long, v: double")
    got = {
        r.id: r["__r"]
        for r in SCH.global_rank(df, "v", "id").select("id", "__r").collect()
    }
    want = {
        id_: i + 1
        for i, (id_, _) in enumerate(
            sorted(((i, v) for i, v in rows if v is not None and i is not None), key=lambda t: (t[1], t[0]))
        )
    }
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.floats(-5, 5, allow_nan=False)),
        min_size=1,
        max_size=80,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=6, deadline=None)
def test_global_rank_matches_definition(spark, rows):
    _ranks_equal_local_sort(spark, rows)


def test_global_rank_survives_ties_and_constants(spark):
    # all-equal values: rank must fall back to the id tie-break entirely
    rows = [(i, 1.0) for i in range(40)]
    _ranks_equal_local_sort(spark, rows)
    # two-value column: every boundary candidate collides
    rows = [(i, float(i % 2)) for i in range(41)]
    _ranks_equal_local_sort(spark, rows)


def test_global_rank_drops_null_rows(spark):
    rows = [(1, 2.0), (2, None), (None, 3.0), (4, 1.0)]
    df = spark.createDataFrame(rows, "id: long, v: double")
    got = SCH.global_rank(df, "v", "id").select("id", "__r", "__n").collect()
    assert {(r.id, r["__r"]) for r in got} == {(4, 1), (1, 2)}
    assert all(r["__n"] == 2 for r in got)


def test_ntile_expr_matches_sql_ntile(spark):
    """The closed-form tile must equal SQL NTILE for every (n, k, r)."""
    for n in (1, 5, 8, 17, 64):
        df = spark.range(1, n + 1).select(
            F.col("id").alias("r"), F.lit(n).alias("n")
        )
        got = {r.r: r.t for r in df.select("r", SCH.ntile_expr("r", "n", 8).alias("t")).collect()}
        want = {
            r.r: r.t
            for r in spark.range(1, n + 1)
            .select(F.col("id").alias("r"))
            .withColumn("t", F.expr("ntile(8) OVER (ORDER BY r)"))
            .collect()
        }
        assert got == want, n


def test_curriculum_stages_equal_depth(spark):
    t = load_views(spark, SF)
    from auto_vectordb_spark.operators import textstats as TS

    docs = t["documents"].where(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    scored = TS.quality_score(docs).join(docs.select("doc_id", "lang"), "doc_id")
    stages = SCH.curriculum_stages(scored).collect()
    n_total = scored.count()
    assert sum(r.n_docs for r in stages) == n_total
    counts = [r.n_docs for r in stages]
    assert max(counts) - min(counts) <= 1  # exact equal depth
    # difficulty must be monotone across stages: stage i's max quality
    # cannot exceed stage i+1's min quality (ties excepted -> <=)
    by_stage = sorted(stages, key=lambda r: r.stage)
    for a, b in zip(by_stage, by_stage[1:]):
        assert a.q_hi <= b.q_lo


def test_interleaved_shards_are_balanced(spark):
    t = load_views(spark, SF)
    from auto_vectordb_spark.operators import textstats as TS

    docs = t["documents"].where(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    scored = TS.quality_score(docs).join(docs.select("doc_id", "lang"), "doc_id")
    shards = SCH.interleaved_shards(scored).collect()
    counts = [r.n_docs for r in shards]
    assert max(counts) - min(counts) <= 1  # round-robin deal
    # every shard spans the difficulty spectrum: quality mass per shard
    # differs by far less than one stage's worth (use 5% of the mean)
    masses = [r.sum_quality_6d / r.n_docs for r in shards]
    mean = sum(masses) / len(masses)
    assert all(abs(m - mean) <= 0.05 * mean for m in masses)


def test_empty_input_yields_empty_schedule(spark):
    df = spark.createDataFrame(
        [], "doc_id: long, n_tokens: int, quality: double, lang: string"
    )
    assert SCH.curriculum_stages(df).count() == 0
    assert SCH.interleaved_shards(df).count() == 0
