"""SQL sugar surface: Spark 4 SQL UDFs equal the DataFrame operators and
stay JVM-side (no Python node in the physical plan)."""

import pytest
from pyspark.sql import functions as F

from auto_vectordb_spark.operators import bm25 as BM25
from auto_vectordb_spark.operators import knn as KNN
from auto_vectordb_spark.plans.parity import load_views
from auto_vectordb_spark.sql_surface import ALL_FUNCTIONS, register_sql_surface


@pytest.fixture(scope="module")
def surface(spark, sf_dir):
    load_views(spark, sf_dir)
    names = register_sql_surface(spark)
    assert names == ALL_FUNCTIONS
    return spark


def test_scalars_match_operators(surface):
    row = surface.sql(
        "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,"
        "       vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,"
        "       tokenize_text('Hello, WORLD 42!') AS t"
    ).collect()[0]
    assert row["d"] == 11.0
    assert row["c"] == 1.0
    assert row["t"] == ["hello", "world", "42"]


def test_similarity_top_k_matches_knn_exact(surface, sf_dir):
    t = load_views(surface, sf_dir)
    sql_rows = surface.sql("SELECT * FROM similarity_top_k(3, 10)").collect()
    queries = (
        t["embeddings"].filter(F.col("vec_id") == 3)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    df_rows = KNN.knn_exact(queries, t["embeddings"], k=10, round_decimals=6).collect()
    assert [(r["vec_id"], r["score"]) for r in sql_rows] == [
        (r["vec_id"], r["score"]) for r in df_rows
    ]


def test_lexical_top_k_matches_bm25_search(surface, sf_dir):
    t = load_views(surface, sf_dir)
    q = "spark join filter"
    sql_rows = surface.sql(f"SELECT * FROM lexical_top_k('{q}', 10)").collect()
    index = BM25.build_index(t["documents"])
    queries = surface.createDataFrame([(0, q)], ["query_id", "query_text"])
    df_rows = (
        BM25.search(index, queries, k=10)
        .select("doc_id", F.round("score", 6).alias("score"))
        .collect()
    )
    assert [(r["doc_id"], r["score"]) for r in sql_rows] == [
        (r["doc_id"], r["score"]) for r in df_rows
    ]


def test_hybrid_top_k_min_score_and_k(surface):
    rows = surface.sql(
        "SELECT * FROM hybrid_top_k(0, 'spark join filter', 5, 0.05)"
    ).collect()
    assert 0 < len(rows) <= 5
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0.05 for s in scores)
    # raising min_score can only shrink the result set
    strict = surface.sql(
        "SELECT * FROM hybrid_top_k(0, 'spark join filter', 5, 100.0)"
    ).collect()
    assert strict == []


def test_nan_embedding_scores_null_and_never_wins_topk(surface, sf_dir):
    """Round-6 advice: the NaN→NULL guard must cover the SQL surface too.
    Spark orders NaN as the LARGEST double, so without nanvl a single
    NaN-element corpus row silently WINS every ORDER BY score DESC top-k
    — the exact corruption mode functions/vector.py::cosine closes for
    the DataFrame operators."""
    row = surface.sql(
        "SELECT vec_cosine(array(double('nan'), 1.0D), array(1.0D, 0.0D)) AS c"
    ).collect()[0]
    assert row["c"] is None  # NULL, not NaN

    surface.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [float("nan"), 1.0]),  # would rank FIRST without nanvl
            (4, [0.0, 0.0]),           # dead vector: zero norm
        ],
        "vec_id long, embedding array<double>",
    ).createOrReplaceTempView("embeddings")
    try:
        rows = surface.sql("SELECT * FROM similarity_top_k(1, 3)").collect()
        assert [r["vec_id"] for r in rows][:2] == [1, 2]  # live rows first
        for r in rows:
            if r["vec_id"] in (3, 4):
                assert r["score"] is None  # NULL, never NaN
            else:
                assert r["score"] == r["score"]  # no NaN leaked
        # hybrid's vector leg: NaN knn becomes NULL -> COALESCE 0, so the
        # fused score is finite for every returned doc
        fused = surface.sql(
            "SELECT * FROM hybrid_top_k(3, 'spark join filter', 5, -100.0)"
        ).collect()
        assert fused and all(r["score"] == r["score"] for r in fused)
    finally:
        load_views(surface, sf_dir)  # restore the parquet-backed view


def test_tvf_plans_are_jvm_only(surface):
    for stmt in [
        "SELECT * FROM similarity_top_k(0, 10)",
        "SELECT * FROM lexical_top_k('spark join filter', 10)",
        "SELECT * FROM hybrid_top_k(0, 'spark join filter', 10, 0.05)",
    ]:
        plan = surface.sql(stmt)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan, stmt
