"""Property-based tests (hypothesis): invariants that must hold for ANY input,
not just fixtures — the test tier the reference entirely lacks (SURVEY §5)."""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

TEXTS = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs")),
    max_size=200,
)


@pytest.fixture(scope="module")
def sql_one(spark):
    """Evaluate a single Column expression over one driver-supplied row."""

    def run(col, **row):
        df = spark.createDataFrame([tuple(row.values())], list(row.keys()))
        return df.select(col.alias("out")).first()["out"]

    return run


@settings(max_examples=30, deadline=None)
@given(text=TEXTS)
def test_tokenize_matches_python_model(sql_one, text):
    from auto_vectordb_spark.functions.text import tokenize

    got = sql_one(tokenize(F.col("t")), t=text)
    want = [tok for tok in re.split(r"[^a-z0-9]+", text.lower()) if tok]
    assert got == want


@settings(max_examples=30, deadline=None)
@given(text=TEXTS, k=st.integers(min_value=2, max_value=4))
def test_shingles_match_python_model(sql_one, text, k):
    from auto_vectordb_spark.functions.text import shingles, tokenize

    got = sql_one(shingles(tokenize(F.col("t")), k), t=text)
    toks = [tok for tok in re.split(r"[^a-z0-9]+", text.lower()) if tok]
    want = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    tokens=st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), max_size=12)
)
def test_stable_hash60_range_and_determinism(sql_one, tokens):
    from auto_vectordb_spark.functions.hashing import stable_hash60

    text = " ".join(tokens)
    a = sql_one(stable_hash60(F.col("t")), t=text)
    b = sql_one(stable_hash60(F.col("t")), t=text)
    assert a == b
    assert 0 <= a < 1 << 60


@settings(max_examples=15, deadline=None)
@given(
    updates=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]), st.integers(0, 9), max_size=4
    )
)
def test_merge_upsert_invariants(spark, updates):
    """After upsert: ids = union of both sides; every updated id carries the
    max version; no duplicate ids."""
    from auto_vectordb_spark.operators.relational import merge_upsert

    existing = spark.createDataFrame(
        [("a", 5), ("b", 1)], ["id", "updated_at"]
    )
    if updates:
        upd = spark.createDataFrame(list(updates.items()), ["id", "updated_at"])
    else:
        upd = existing.limit(0)
    out = merge_upsert(existing, upd, "id").collect()
    ids = [r["id"] for r in out]
    assert len(ids) == len(set(ids))
    assert set(ids) == {"a", "b"} | set(updates)
    base = {"a": 5, "b": 1}
    for r in out:
        versions = [v for v in (base.get(r["id"]), updates.get(r["id"])) if v is not None]
        assert r["updated_at"] == max(versions)
