"""Hybrid BM25 + vector fusion (reference V4, /root/reference/backend/process/
elasticsearch_index.py:215-306).

The reference builds one ES bool query: ``should: [match(boost=1.0),
knn(boost=0.8)]``, ``minimum_should_match: 1``, then ``min_score`` cut and
top ``size``. That is a *weighted sum over the union of both result sets* —
here a full-outer join of the two score DataFrames on (query_id, doc_id):

    fused = 1.0 * coalesce(bm25, 0) + 0.8 * coalesce(knn, 0)

``minimum_should_match: 1`` ≡ the row exists in at least one side ≡ full
outer join membership. An RRF variant (the comment at
elasticsearch_index.py:222 *claims* RRF; the implementation is weighted
boolean score — we provide both, weighted is the parity default).

Scale: both inputs arrive already reduced to (query, doc, score) — small
relative to the corpus — so the fusion join is cheap; scores never touch the
full corpus again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .relational import top_k_per_group

TEXT_BOOST = 1.0   # elasticsearch_index.py:241
VECTOR_BOOST = 0.8  # elasticsearch_index.py:255,276


def fuse_weighted(
    bm25_scores: DataFrame,
    knn_scores: DataFrame,
    text_boost: float = TEXT_BOOST,
    vector_boost: float = VECTOR_BOOST,
    min_score: float = 0.0,
    k: int = 10,
) -> DataFrame:
    """Weighted-sum fusion — exact reference semantics (V4).

    Inputs: (query_id, doc_id, score) each. Output: top-k per query with
    ``score`` = text_boost*bm25 + vector_boost*knn, filtered to >= min_score,
    ties broken by doc_id asc.
    """
    b = bm25_scores.select("query_id", "doc_id", F.col("score").alias("bm25"))
    v = knn_scores.select("query_id", "doc_id", F.col("score").alias("knn"))
    fused = b.join(v, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.lit(text_boost) * F.coalesce(F.col("bm25"), F.lit(0.0))
            + F.lit(vector_boost) * F.coalesce(F.col("knn"), F.lit(0.0))
        ).alias("score"),
    )
    fused = fused.filter(F.col("score") >= min_score)
    return top_k_per_group(fused, ["query_id"], "score", k, tie_break="doc_id")


def fuse_rrf(
    bm25_scores: DataFrame,
    knn_scores: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion: score = Σ 1/(rrf_k + rank_leg). The fusion the
    reference's comment promises (elasticsearch_index.py:222) but never ships.
    """
    def ranked(df: DataFrame, leg: str) -> DataFrame:
        w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
        return df.select(
            "query_id", "doc_id", F.row_number().over(w).alias(f"rank_{leg}")
        )

    b, v = ranked(bm25_scores, "b"), ranked(knn_scores, "v")
    fused = b.join(v, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.when(F.col("rank_b").isNotNull(), 1.0 / (rrf_k + F.col("rank_b"))).otherwise(0.0)
            + F.when(F.col("rank_v").isNotNull(), 1.0 / (rrf_k + F.col("rank_v"))).otherwise(0.0)
        ).alias("score"),
    )
    return top_k_per_group(fused, ["query_id"], "score", k, tie_break="doc_id")
