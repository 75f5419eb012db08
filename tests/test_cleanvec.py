"""Unit gates for functions/cleanvec.py — the shared row-hygiene contract
of the BLAS/LSH kernels (r9 fix for the five deferred empty/dirty
crashers). The end-to-end coverage lives in the empty/dirty mirror gates;
these pin the helper semantics and the builder-level degenerate returns."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from auto_vectordb_spark.functions import cleanvec as CV
from auto_vectordb_spark.operators import dedup as DD
from auto_vectordb_spark.operators import knn as KNN


# ---------------------------------------------------------------- helpers


def test_modal_dim_picks_majority_and_ignores_invalid():
    assert CV.modal_dim([[1.0, 2.0], None, [3.0], [], [4.0, 5.0]]) == 2
    assert CV.modal_dim([None, []]) is None
    assert CV.modal_dim([]) is None
    # tie prefers the larger dimension (a truncated row is the likelier
    # corruption than a padded one)
    assert CV.modal_dim([[1.0], [1.0, 2.0]]) == 2


def test_probe_dim_on_dataframe(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [0.5, 0.5, 0.5]), (4, [3.0, 4.0]), (5, [])],
        "vec_id long, embedding array<double>",
    )
    assert CV.probe_dim(df, "embedding") == 2
    assert CV.probe_dim(df.where(F.lit(False)), "embedding") is None
    assert CV.probe_dim(df.where("embedding is null"), "embedding") is None


def test_clean_block_masks_bad_vectors_and_null_ids():
    pdf = pd.DataFrame(
        {
            # NULL long ids arrive as NaN after Arrow->pandas conversion
            "vec_id": [1.0, 2.0, np.nan, 4.0, 5.0],
            "embedding": [[1.0, 2.0], None, [3.0, 4.0], [9.0], [5.0, 6.0]],
        }
    )
    mask, M = CV.clean_block(pdf, "embedding", 2, id_col="vec_id")
    assert mask.tolist() == [True, False, False, False, True]
    assert M.shape == (2, 2) and M.dtype == np.float64
    assert M[1].tolist() == [5.0, 6.0]
    # nothing survives -> (all-false mask, None), never np.stack([])
    mask2, M2 = CV.clean_block(pdf.iloc[1:4], "embedding", 2, id_col="vec_id")
    assert not mask2.any() and M2 is None


def test_clean_rows_filters_like_clean_block(spark):
    rows = spark.createDataFrame(
        [(1, [1.0, 2.0]), (None, [3.0, 4.0]), (3, None), (4, [5.0])],
        "query_id long, embedding array<double>",
    ).collect()
    kept = CV.clean_rows(rows, "embedding", 2, id_field="query_id")
    assert [r["query_id"] for r in kept] == [1]


# ------------------------------------------------- builder-level contracts


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.mark.parametrize("case", ["empty", "all_null"])
def test_knn_exact_blas_degenerate_query_side(spark, case):
    corpus = _emb(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])])
    queries = (
        _emb(spark, []) if case == "empty" else _emb(spark, [(7, None), (8, [])])
    ).withColumnRenamed("vec_id", "query_id")
    out = KNN.knn_exact_blas(queries, corpus, k=2)
    assert out.columns == ["query_id", "vec_id", "score"]
    assert out.count() == 0


def test_knn_exact_blas_drops_dirty_rows_matches_clean_run(spark):
    clean_corpus = [(i, [float(i), 1.0]) for i in range(1, 6)]
    dirty_corpus = clean_corpus + [(9, None), (10, [1.0]), (None, [1.0, 1.0])]
    queries = _emb(spark, [(0, [1.0, 1.0]), (1, None)]).withColumnRenamed(
        "vec_id", "query_id"
    )
    got = KNN.knn_exact_blas(queries, _emb(spark, dirty_corpus), k=3, round_decimals=6)
    want = KNN.knn_exact_blas(
        queries.where("embedding is not null"), _emb(spark, clean_corpus), k=3,
        round_decimals=6,
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_blas_neardup_builders_degenerate_on_empty_and_all_null(spark):
    for vectors in (_emb(spark, []), _emb(spark, [(1, None), (2, [])])):
        for fn in (
            DD.embedding_neardup_pairs_blas,
            DD.embedding_neardup_pairs_blas_bucketed,
            DD.embedding_neardup_lsh,
        ):
            out = fn(vectors)
            assert out.columns == ["id_a", "id_b", "cosine"]
            assert out.count() == 0


def test_blas_neardup_dirty_rows_match_clean_run(spark):
    clean = [(i, [1.0, float(i % 3)]) for i in range(1, 8)]
    dirty = clean + [(11, None), (12, [1.0, 2.0, 3.0]), (None, [1.0, 1.0]), (13, [])]
    got = DD.embedding_neardup_pairs_blas(_emb(spark, dirty), threshold=0.9)
    want = DD.embedding_neardup_pairs_blas(_emb(spark, clean), threshold=0.9)
    k = lambda df: sorted((r["id_a"], r["id_b"], round(r["cosine"], 9)) for r in df.collect())  # noqa: E731
    assert k(got) == k(want)


def test_lsh_model_none_on_empty_and_search_degrades(spark):
    model, indexed = KNN.lsh_model(_emb(spark, [(1, None)]))
    assert model is None
    out = KNN.lsh_search(model, indexed, [1.0, 0.0], k=3)
    assert "distance" in out.columns
    assert out.count() == 0


def test_clean_block_drops_nonfinite_vectors():
    import math

    pdf = pd.DataFrame(
        {
            "vec_id": [1.0, 2.0, 3.0, 4.0],
            "embedding": [
                [1.0, 2.0],
                [math.nan, 1.0],   # NaN element: row drops
                [math.inf, 0.0],   # inf element: row drops
                [3.0, 4.0],
            ],
        }
    )
    mask, M = CV.clean_block(pdf, "embedding", 2, id_col="vec_id")
    assert mask.tolist() == [True, False, False, True]
    assert M.shape == (2, 2) and np.isfinite(M).all()
    rows_all_bad = pdf.iloc[1:3]
    mask2, M2 = CV.clean_block(rows_all_bad, "embedding", 2, id_col="vec_id")
    assert not mask2.any() and M2 is None


def test_knn_exact_dot_metric_nan_vector_never_wins(spark):
    """Spark orders NaN as the LARGEST double, so without the isnan guard
    a single NaN embedding wins EVERY desc top-k under the dot metric
    (cosine is already nan_to_null'd) — silent retrieval corruption."""
    import math

    corpus = _emb(
        spark,
        [(1, [1.0, 0.0]), (2, [0.5, 0.5]), (3, [math.nan, 1.0]), (4, [0.0, 1.0])],
    )
    queries = _emb(spark, [(0, [1.0, 1.0])]).withColumnRenamed("vec_id", "query_id")
    got = KNN.knn_exact(queries, corpus, k=3, metric="dot").collect()
    ids = [r["vec_id"] for r in got]
    assert 3 not in ids, f"NaN corpus vector hijacked the top-k: {ids}"
    assert len(ids) == 3 and all(
        r["score"] == r["score"] for r in got
    )  # no NaN scores emitted


def test_knn_exact_blas_nan_query_and_corpus_rows_drop(spark):
    import math

    corpus = _emb(
        spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [math.nan, math.nan])]
    )
    queries = _emb(
        spark, [(0, [1.0, 1.0]), (9, [math.nan, 0.0])]
    ).withColumnRenamed("vec_id", "query_id")
    got = KNN.knn_exact_blas(queries, corpus, k=3, round_decimals=6).collect()
    assert {r["query_id"] for r in got} == {0}  # NaN query retrieves nothing
    assert all(r["vec_id"] != 3 for r in got)   # NaN corpus row never retrieved


def test_valid_vec_predicate(spark):
    import math

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0]),            # valid
            (2, None),                  # NULL vector
            (3, []),                    # zero-length
            (4, [1.0, None]),           # NULL element
            (5, [1.0, 2.0, 3.0]),       # ragged (vs dim=2)
            (6, [math.nan, 1.0]),       # NaN element: allowed here (kernels
        ],                              # mask it; expressions nan_to_null it)
        "vec_id long, embedding array<double>",
    )
    ids = lambda c: sorted(r["vec_id"] for r in df.where(c).collect())  # noqa: E731
    assert ids(CV.valid_vec("embedding")) == [1, 5, 6]
    assert ids(CV.valid_vec("embedding", dim=2)) == [1, 6]


def test_clean_rows_survives_null_element_vectors(spark):
    """A NULL element arrives as Python None from collect(); math.isfinite
    would TypeError on it — the row must drop, not kill the driver."""
    rows = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, None]), (3, [float("nan"), 1.0])],
        "query_id long, embedding array<double>",
    ).collect()
    kept = CV.clean_rows(rows, "embedding", 2, id_field="query_id")
    assert [r["query_id"] for r in kept] == [1]


# ------------------------------------------------- property-based contract

from hypothesis import given, settings
from hypothesis import strategies as st

_element = st.one_of(
    st.none(),
    st.floats(allow_nan=True, allow_infinity=True, width=64),
)
_vector = st.one_of(
    st.none(),
    st.lists(_element, min_size=0, max_size=5),
)
_row = st.tuples(st.one_of(st.none(), st.integers(0, 10**17)), _vector)


def _valid(v, i, dim):
    import math

    return (
        i is not None
        and v is not None
        and len(v) == dim
        and all(x is not None and math.isfinite(x) for x in v)
    )


@settings(max_examples=200, deadline=None)
@given(st.lists(_row, min_size=0, max_size=30), st.integers(1, 5))
def test_clean_block_mask_matches_reference_predicate(rows, dim):
    """For ANY batch composition, clean_block's survivors are exactly the
    rows with a non-NULL id and a finite dim-length vector, in order —
    no crash, no silent admission, no over-dropping."""
    pdf = pd.DataFrame(
        {
            "vec_id": pd.array(
                [i for i, _ in rows], dtype="float64"  # Arrow null-int form
            ),
            "embedding": pd.Series(
                [
                    None
                    if v is None
                    else np.array(
                        [np.nan if x is None else x for x in v], dtype=np.float64
                    )
                    for _, v in rows
                ],
                dtype=object,
            ),
        }
    )
    mask, M = CV.clean_block(pdf, "embedding", dim, id_col="vec_id")
    want = [_valid(v, i, dim) for i, v in rows]
    assert mask.tolist() == want
    if any(want):
        assert M.shape == (sum(want), dim) and np.isfinite(M).all()
    else:
        assert M is None


@settings(max_examples=200, deadline=None)
@given(st.lists(_row, min_size=0, max_size=30), st.integers(1, 5))
def test_clean_rows_agrees_with_clean_block(rows, dim):
    """Driver-side and kernel-side cleaners accept EXACTLY the same rows
    (clean_rows sees Python None where the kernel sees NaN)."""

    class R(dict):
        def __getitem__(self, k):
            return dict.__getitem__(self, k)

    row_objs = [R(query_id=i, embedding=v) for i, v in rows]
    kept = CV.clean_rows(row_objs, "embedding", dim, id_field="query_id")
    want = [r for (i, v), r in zip(rows, row_objs) if _valid(v, i, dim)]
    assert kept == want
