"""BM25 scoring against hand-computed values; hybrid fusion semantics."""

import math

from auto_vectordb_spark.operators import bm25 as BM25
from auto_vectordb_spark.operators import hybrid as HY

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat"),
    (2, "a fish swam"),
]


def _expected_bm25(term_tf: int, dl: int, df: int, n: int, avgdl: float) -> float:
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * term_tf * (BM25.K1 + 1) / (
        term_tf + BM25.K1 * (1 - BM25.B + BM25.B * dl / avgdl)
    )


def test_bm25_known_values(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    index = BM25.build_index(docs)
    assert index.n_docs == 3
    assert index.avgdl == (6 + 3 + 3) / 3
    queries = spark.createDataFrame([(0, "cat")], ["query_id", "query_text"])
    out = BM25.search(index, queries, k=5).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 0
    expect = _expected_bm25(term_tf=1, dl=6, df=1, n=3, avgdl=4.0)
    assert abs(out[0]["score"] - expect) < 1e-9


def test_bm25_multi_term_sums(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    index = BM25.build_index(docs)
    queries = spark.createDataFrame([(0, "cat sat")], ["query_id", "query_text"])
    out = {r["doc_id"]: r["score"] for r in BM25.search(index, queries, k=5).collect()}
    # doc0 matches both terms, doc1 only 'sat' → doc0 strictly higher
    assert set(out) == {0, 1}
    assert out[0] > out[1]


def _scores(spark, rows):
    return spark.createDataFrame(rows, ["query_id", "doc_id", "score"])


def test_fuse_weighted_semantics(spark):
    """minimum_should_match=1 ≡ union membership; boosts 1.0/0.8; min_score."""
    b = _scores(spark, [(0, 10, 2.0), (0, 11, 1.0)])
    v = _scores(spark, [(0, 11, 0.5), (0, 12, 0.9)])
    out = {r["doc_id"]: r["score"] for r in HY.fuse_weighted(b, v, k=10).collect()}
    assert abs(out[10] - 2.0) < 1e-12          # bm25-only leg
    assert abs(out[11] - (1.0 + 0.8 * 0.5)) < 1e-12
    assert abs(out[12] - 0.8 * 0.9) < 1e-12    # knn-only leg
    cut = {r["doc_id"] for r in HY.fuse_weighted(b, v, min_score=1.0, k=10).collect()}
    assert cut == {10, 11}


def test_fuse_rrf(spark):
    b = _scores(spark, [(0, 10, 2.0), (0, 11, 1.0)])
    v = _scores(spark, [(0, 10, 0.9), (0, 12, 0.8)])
    out = {r["doc_id"]: r["score"] for r in HY.fuse_rrf(b, v, k=10).collect()}
    assert abs(out[10] - (1 / 61 + 1 / 61)) < 1e-12  # rank 1 both legs
    assert abs(out[11] - 1 / 62) < 1e-12
    assert abs(out[12] - 1 / 62) < 1e-12


def test_rerank_token_overlap_orders_by_jaccard(spark):
    from auto_vectordb_spark.operators.hybrid import rerank_token_overlap

    cand = spark.createDataFrame(
        [(0, 1, 9.0), (0, 2, 8.0), (0, 3, 7.0)], ["query_id", "doc_id", "score"]
    )
    queries = spark.createDataFrame([(0, "alpha beta")], ["query_id", "query_text"])
    docs = spark.createDataFrame(
        [(1, "zeta"), (2, "alpha beta"), (3, "alpha gamma")], ["doc_id", "text"]
    )
    rows = rerank_token_overlap(cand, queries, docs, k=2).collect()
    got = [(r["doc_id"], r["rerank_score"]) for r in rows]
    # doc 2 is a perfect overlap (1.0), doc 3 shares 1 of 3 distinct tokens
    assert got == [(2, 1.0), (3, round(1 / 3, 6))]
    # stage-1 score survives for downstream fusion/inspection
    assert {r["doc_id"]: r["stage1_score"] for r in rows} == {2: 8.0, 3: 7.0}
