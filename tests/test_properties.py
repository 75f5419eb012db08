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


@settings(max_examples=30, deadline=None, derandomize=True)
@given(text=TEXTS)
def test_tokenize_matches_python_model(sql_one, text):
    from auto_vectordb_spark.functions.text import tokenize

    got = sql_one(tokenize(F.col("t")), t=text)
    want = [tok for tok in re.split(r"[^a-z0-9]+", text.lower()) if tok]
    assert got == want


@settings(max_examples=30, deadline=None, derandomize=True)
@given(text=TEXTS, k=st.integers(min_value=2, max_value=4))
def test_shingles_match_python_model(sql_one, text, k):
    from auto_vectordb_spark.functions.text import shingles, tokenize

    got = sql_one(shingles(tokenize(F.col("t")), k), t=text)
    toks = [tok for tok in re.split(r"[^a-z0-9]+", text.lower()) if tok]
    want = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    assert got == want


@settings(max_examples=20, deadline=None, derandomize=True)
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


@settings(max_examples=15, deadline=None, derandomize=True)
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


@settings(max_examples=20, deadline=None, derandomize=True)
@given(
    n_tokens=st.integers(min_value=0, max_value=90),
    max_tokens=st.integers(min_value=4, max_value=16),
    overlap=st.integers(min_value=0, max_value=8),
)
def test_chunk_text_covers_and_overlaps(spark, n_tokens, max_tokens, overlap):
    """chunk_text invariants for ANY (doc length, window, overlap):
    - stride reconstruction: chunk i starts at token i*stride;
    - full coverage: chunks concatenated with overlap removed == tokens;
    - adjacent chunks share exactly `overlap` tokens (when both are full)."""
    from auto_vectordb_spark.operators.textstats import chunk_text

    overlap = min(overlap, max_tokens - 1)
    stride = max_tokens - overlap
    toks = [f"t{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(toks))], ["doc_id", "text"])
    rows = sorted(
        chunk_text(df, max_tokens=max_tokens, overlap=overlap).collect(),
        key=lambda r: r["chunk_idx"],
    )
    got_chunks = [r["chunk_text"].split(" ") for r in rows]
    if not toks:
        # an empty doc still yields its (empty-filtered) single chunk = none
        assert got_chunks == []
        return
    for i, c in enumerate(got_chunks):
        assert c == toks[i * stride : i * stride + max_tokens]
    # coverage: de-overlapped concatenation reconstructs the token stream
    rebuilt = got_chunks[0] + [t for c in got_chunks[1:] for t in c[overlap:]]
    assert rebuilt == toks
