"""Vector (embedding) column expressions — JVM-side, no Python in the hot path.

The reference stores 1024-d embeddings and delegates similarity to
Elasticsearch kNN (/root/reference/backend/process/elasticsearch_index.py:
261-277). Here similarity is a Catalyst expression over ``array<float>``
columns: `zip_with` + `aggregate` stay inside whole-stage codegen, so a
crossJoin scorer runs vectorized on the JVM with zero serde. All math is done
in DOUBLE regardless of storage type so results are engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMBEDDING_DIM = 1024  # reference dim (elasticsearch_index.py:41); fixtures use 64


def as_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double. DuckDB twin:
    ``list_sum(list_transform(range(1, len(a)+1), i ->
      CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE)))``"""
    return F.aggregate(
        F.zip_with(as_double_array(a), as_double_array(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either vector has zero norm.

    ``try_divide`` (identical doubles to ``/`` on non-zero denominators)
    instead of bare division: under Spark's default ANSI mode a single
    zero-norm (dead) embedding in a 100 TB corpus would otherwise throw
    DIVIDE_BY_ZERO and kill the whole job — the row must fail, not the
    job. NULL scores sort last under every desc top-k in this package
    (Spark desc = NULLS LAST), so dead vectors are naturally excluded.
    DuckDB twin uses ``nullif(denom, 0)`` for the same semantics.

    NaN inputs also map to NULL (via :func:`nan_to_null`): Spark orders
    NaN as the LARGEST double, so a single NaN embedding would otherwise
    WIN every desc top-k — silent retrieval corruption, worse than the
    crash. (The numpy BLAS kernels are naturally safe: -NaN sorts last
    under argpartition.)"""
    return nan_to_null(F.try_divide(dot(a, b), norm(a) * norm(b)))


def cosine_with_norms(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine with precomputed norms — same expression tree as :func:`cosine`
    (try_divide(dot, na·nb), so results are bit-identical, zero-norm → NULL),
    but the O(n²) pair stage only evaluates ONE array reduction instead of
    three. Precompute norms (and the array<double> cast) per vector BEFORE
    the pair join."""
    return nan_to_null(F.try_divide(dot(a, b), norm_a * norm_b))


def nan_to_null(c: Column) -> Column:
    """NaN → NULL for a double column; NULL passes through. ``nanvl``
    evaluates its input ONCE — a when(isnan(c)).otherwise(c) would
    evaluate the full cosine expression twice in the O(n·q) pair stage.
    DuckDB twin: ``CASE WHEN isnan(x) THEN NULL ELSE x END``."""
    return F.nanvl(c, F.lit(None).cast("double"))


def dim_guard(df: DataFrame, col: str, dim: int = EMBEDDING_DIM) -> DataFrame:
    """P6 — reject rows whose embedding isn't exactly ``dim`` floats
    (reference rejects the query at the API layer, es_index.py:107-111;
    at 100 TB a malformed row should fail the row, not the job)."""
    return df.filter(F.size(F.col(col)) == dim)


# --- DuckDB twins (SQL string builders) -----------------------------------


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def cosine_sql(a: str, b: str) -> str:
    # nullif mirrors the engine's try_divide: zero-norm vector -> NULL
    return (
        f"({dot_sql(a, b)} / "
        f"nullif(sqrt({dot_sql(a, a)}) * sqrt({dot_sql(b, b)}), 0))"
    )


def safe_row_norms(m):
    """Row L2 norms of a 2-D numpy matrix with zeros mapped to inf — the
    BLAS-kernel twin of :func:`cosine`'s try_divide: dividing by the
    result turns a zero-norm (dead) row into an all-zero unit row whose
    cosine with everything is exactly 0.0, so it never wins a top-k and
    never emits NaN into scores (numpy would otherwise warn and
    propagate NaN, which ranks FIRST under argpartition)."""
    import numpy as np

    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = np.inf
    return n


def max_abs(a: Column) -> Column:
    """max_i |a_i| in double (the symmetric-quantization range)."""
    return F.array_max(F.transform(as_double_array(a), F.abs))


def quantize_int8(a: Column) -> tuple[Column, Column]:
    """Symmetric per-vector int8 quantization → (scale, quantized array).

    q_i = round(a_i · 127/max|a|) ∈ [-127, 127]; dequantize as q_i / scale.
    Cuts embedding storage 4× (float32→int8) — at 100 TB of vectors that is
    the difference between caching the index in executor memory or not; kNN
    over int8 with per-vector rescale loses <0.5% recall@10 in practice.
    All-zero vectors get scale 0 and an all-zero q (guarded, no div-by-0).

    Expression-only (oracle-able, JVM eval); per-element lambdas evaluate
    interpreted, so for bulk re-encodes prefer the Arrow/numpy kernel in
    operators/knn.py's BLAS path style. Reference stores raw float lists
    (embeddings TEXT column, backend/utils/schema.py:13); quantization is
    a scale extension it never needed at 5 PDFs.
    """
    ad = as_double_array(a)
    amax = F.array_max(F.transform(ad, F.abs))
    scale = F.when(amax > 0.0, F.lit(127.0) / amax).otherwise(F.lit(0.0))
    q = F.transform(ad, lambda x: F.round(x * scale).try_cast("int"))
    return scale, q


def dequantize_int8(q: Column, scale: Column) -> Column:
    """Inverse of :func:`quantize_int8` (max abs error 0.5/scale per dim)."""
    return F.when(
        scale > 0.0, F.transform(q, lambda x: x.cast("double") / scale)
    ).otherwise(F.transform(q, lambda x: F.lit(0.0)))
