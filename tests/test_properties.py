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


# --- round-3 algorithm invariants ---------------------------------------

WORDS = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=6),
    min_size=1,
    max_size=20,
)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(words=WORDS, batch=st.sampled_from([2, 5]))
def test_bpe_batched_equals_sequential_property(spark, words, batch):
    """The _select_merge_batch safety rule must make batched training
    IDENTICAL to sequential for ANY corpus, not just the fixture ones —
    this is the property the equivalence argument in tokenizer.py claims."""
    from auto_vectordb_spark.operators import tokenizer as TK

    docs = spark.createDataFrame([(0, " ".join(words))], ["doc_id", "text"])
    seq = [
        (r["rank"], r["left"], r["right"], r["freq"])
        for r in TK.bpe_train(docs, num_merges=8, min_freq=2)[0]
        .orderBy("rank")
        .collect()
    ]
    bat = [
        (r["rank"], r["left"], r["right"], r["freq"])
        for r in TK.bpe_train(docs, num_merges=8, min_freq=2, merge_batch=batch)[0]
        .orderBy("rank")
        .collect()
    ]
    assert bat == seq


EDGE_LISTS = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=15,
    unique=True,
)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(edges=EDGE_LISTS)
def test_pagerank_mass_conserved_any_directed_graph(spark, edges):
    """With dangling redistribution, total rank is exactly 1 on ANY directed
    edge list — sinks, cycles, disconnected pieces."""
    from auto_vectordb_spark.operators import graph as G

    ranks = G.pagerank(
        spark.createDataFrame(edges, ["src", "dst"]), iterations=4
    ).collect()
    total = sum(r["rank"] for r in ranks)
    assert abs(total - 1.0) < 1e-9
    assert all(r["rank"] > 0 for r in ranks)


@settings(max_examples=8, deadline=None, derandomize=True)
@given(
    quals=st.lists(
        st.floats(0.0, 1.0, allow_nan=False).map(lambda q: round(q, 3)),
        min_size=6,
        max_size=6,
    )
)
def test_keep_best_one_survivor_per_component(spark, quals):
    """keep_best elects exactly one survivor per component — the max-quality
    member (min id on ties) — and passes singletons through, for ANY
    quality assignment."""
    from auto_vectordb_spark.operators import dedup as DD

    ids = [1, 2, 3, 4, 5, 6]
    docs = spark.createDataFrame([(i, "t") for i in ids], ["doc_id", "text"])
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], ["id_a", "id_b"])
    quality = spark.createDataFrame(
        list(zip(ids, quals)), ["doc_id", "quality"]
    )
    got = {
        r["doc_id"] for r in DD.apply_dedup_keep_best(docs, pairs, quality).collect()
    }
    q = dict(zip(ids, quals))
    want_a = min([i for i in (1, 2, 3) if q[i] == max(q[1], q[2], q[3])])
    want_b = min([i for i in (4, 5) if q[i] == max(q[4], q[5])])
    assert got == {want_a, want_b, 6}


@settings(max_examples=30, deadline=None, derandomize=True)
@given(text=TEXTS)
def test_sentence_split_matches_python_model(sql_one, text):
    """Pure-Python model of the RE2-portable sentinel split: the Spark
    column (textstats.sentence_split) must produce the exact array for ANY
    text, including punctuation runs, missing terminators, and unicode
    whitespace categories."""
    from auto_vectordb_spark.operators.textstats import sentence_split

    got = sql_one(sentence_split(F.col("t")), t=text)
    # Java regex \s is ASCII-only ([ \t\n\x0b\f\r]) — unlike Python's
    # Unicode-aware \s — and that ASCII reading is exactly what RE2/DuckDB
    # share, so the model must use the explicit class
    want = re.sub(r"([.!?])[ \t\n\x0b\f\r]+", "\\1\x01", text).split("\x01")
    assert got == want


@settings(max_examples=30, deadline=None, derandomize=True)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Nd", "Po", "Zs")),
            max_size=120,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_sentence_segments_matches_python_model(spark, texts):
    """sentence_segments = split → trim → drop empties → 1-based index, for
    ANY corpus (the reassembly contract remove_dup_sentences relies on)."""
    from auto_vectordb_spark.operators.textstats import sentence_segments

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r["doc_id"], r["sent_idx"]): r["sent"]
        for r in sentence_segments(df).collect()
    }
    want = {}
    for i, text in enumerate(texts):
        parts = re.sub(r"([.!?])[ \t\n\x0b\f\r]+", "\\1\x01", text).split("\x01")
        idx = 0
        for p in parts:
            # Spark F.trim strips the SPACE character only (as does DuckDB
            # trim) — not Python's full Unicode whitespace set
            p = p.strip(" ")
            if p:
                idx += 1
                want[(i, idx)] = p
    assert got == want


@settings(max_examples=40, deadline=None, derandomize=True)
@given(text=st.text(max_size=60))
def test_stable_hash60_matches_duckdb(sql_one, text):
    """The 60-bit MD5 hash is the foundation every dedup oracle rests on —
    pin Spark == DuckDB directly for arbitrary unicode, not just via the
    fixture corpus."""
    import duckdb

    from auto_vectordb_spark.functions import hashing as H

    got = sql_one(H.stable_hash60(F.col("t")), t=text)
    want = duckdb.execute(
        f"SELECT {H.stable_hash60_sql('x')} FROM (SELECT ? AS x)", [text]
    ).fetchone()[0]
    assert got == want


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    h=st.integers(min_value=0, max_value=(1 << 60) - 1),
    j=st.integers(min_value=0, max_value=15),
)
def test_universal_hash_matches_duckdb(sql_one, h, j):
    """MinHash permutation family: Spark and DuckDB must agree for every
    60-bit input and every (a, b) parameter pair in use."""
    import duckdb

    from auto_vectordb_spark.functions import hashing as H

    a, b = H.minhash_params(16)[j]
    got = sql_one(H.universal_hash(F.col("h"), a, b), h=h)
    want = duckdb.execute(
        f"SELECT {H.universal_hash_sql('x', a, b)} FROM (SELECT CAST(? AS BIGINT) AS x)",
        [h],
    ).fetchone()[0]
    assert got == want


@settings(max_examples=40, deadline=None, derandomize=True)
@given(text=TEXTS)
def test_tokenize_matches_duckdb(sql_one, text):
    """The tokenizer's DuckDB twin (string_split_regex + list_filter) must
    agree with Spark for arbitrary text — the foundation of every
    BM25/TF-IDF/shingle oracle. Alphabet = the TEXTS categories (letters,
    digits, punctuation, space separators); exotic locale-specific
    lowercasing (e.g. U+0130) is out of contract — the oracle rules pin
    inputs to text the two engines lowercase identically."""
    import duckdb

    from auto_vectordb_spark.functions.text import tokenize

    got = sql_one(tokenize(F.col("t")), t=text)
    want = duckdb.execute(
        "SELECT list_filter(string_split_regex(lower(x), '[^a-z0-9]+'), t -> t <> '') "
        "FROM (SELECT ? AS x)",
        [text],
    ).fetchone()[0]
    assert got == want


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    vals=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False).map(
            lambda x: round(x, 3)
        ),
        min_size=2,
        max_size=8,
    )
)
def test_cosine_matches_duckdb(spark, vals):
    """Cosine similarity cross-engine: same fold order (index-ascending
    sums on both sides), so agreement must hold to far better than the
    6-decimal rounding every oracle applies before ranking."""
    import duckdb

    from auto_vectordb_spark.functions import vector as V

    a = vals
    b = list(reversed(vals))
    if sum(x * x for x in a) == 0 or sum(x * x for x in b) == 0:
        return  # zero vector: division undefined, excluded by dim_guard upstream
    df = spark.createDataFrame(
        [(a, b)], "a array<double>, b array<double>"
    )
    got = df.select(V.cosine(F.col("a"), F.col("b")).alias("c")).first()["c"]
    want = duckdb.execute(
        f"SELECT {V.cosine_sql('a', 'b')} FROM (SELECT ? AS a, ? AS b)", [a, b]
    ).fetchone()[0]
    assert abs(got - want) < 1e-9, (got, want)


@settings(max_examples=30, deadline=None, derandomize=True)
@given(text=TEXTS, k=st.integers(min_value=2, max_value=4))
def test_shingles_match_duckdb(sql_one, text, k):
    """The word-k-gram twin (documented in functions/text.py shingles):
    1-based inclusive list slices in DuckDB must equal the zip_with chain
    in Spark for any text and k."""
    import duckdb

    from auto_vectordb_spark.functions.text import shingles, tokenize

    got = sql_one(shingles(tokenize(F.col("t")), k), t=text)
    want = duckdb.execute(
        "WITH tok AS (SELECT list_filter(string_split_regex(lower(x), '[^a-z0-9]+'),"
        " t -> t <> '') AS toks FROM (SELECT ? AS x)) "
        f"SELECT CASE WHEN len(toks) < {k} THEN [] ELSE "
        f"list_transform(range(1, len(toks) - {k - 2}), i -> "
        f"array_to_string(toks[i:i+{k - 1}], ' ')) END FROM tok",
        [text],
    ).fetchone()[0]
    assert got == want


ASCII_TEXTS = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=48
)


@settings(max_examples=30, deadline=None, derandomize=True)
@given(a=ASCII_TEXTS, b=ASCII_TEXTS)
def test_levenshtein_matches_duckdb_and_python_ascii(sql_one, a, b):
    """neardup_levenshtein_pairs rests on Spark's levenshtein == DuckDB's
    levenshtein over the oracle domain — pin both against each other AND a
    pure-Python Wagner-Fischer model (unit costs, no transposition).

    ASCII only BY DESIGN: DuckDB's levenshtein counts UTF-8 BYTES while
    Spark counts code points (found by this test's unicode predecessor:
    levenshtein('', '\\xa0') = 1 in Spark, 2 in DuckDB), so the engines
    agree exactly on single-byte text and the divergence is pinned in
    test_levenshtein_unicode_divergence_is_known below.
    """
    import duckdb

    got = sql_one(F.levenshtein(F.col("a"), F.col("b")), a=a, b=b)
    want = duckdb.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    assert got == want == prev[len(b)]


def test_levenshtein_unicode_divergence_is_known(sql_one):
    """Document (don't hide) the engine boundary: Spark edits CODE POINTS,
    DuckDB edits UTF-8 BYTES. If either engine ever changes, this test
    fails and the neardup_levenshtein_pairs oracle domain must be
    re-reviewed (the fixture corpus is pure ASCII — verified in
    parity doctrine — where both definitions coincide)."""
    import duckdb

    got = sql_one(F.levenshtein(F.col("a"), F.col("b")), a="", b="\xa0")
    want = duckdb.execute("SELECT levenshtein(?, ?)", ["", "\xa0"]).fetchone()[0]
    assert got == 1  # one code point
    assert want == 2  # two UTF-8 bytes


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    a=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=2, max_size=8,
    ),
    b=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=2, max_size=8,
    ),
)
def test_cosine_guarded_matches_bare_division(sql_one, a, b):
    """The round-6 robustness wrapper (nanvl ∘ try_divide) must be
    BIT-IDENTICAL to bare division whenever both vectors have non-zero
    norm — that identity is what keeps the oracle parity of every cosine
    entry intact — and NULL exactly when either norm is zero."""
    import math

    from auto_vectordb_spark.functions import vector as V

    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    got = sql_one(
        V.cosine(F.col("a").cast("array<double>"), F.col("b").cast("array<double>")),
        a=a, b=b,
    )
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    if na == 0.0 or nb == 0.0:
        assert got is None
        return
    # python float ops are IEEE doubles — same sequential fold order
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    want = dot / (na * nb)
    if math.isnan(want):
        assert got is None
    else:
        assert got == want  # bit-exact, not approx


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    rows=st.lists(
        st.lists(
            st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
            min_size=3, max_size=3,
        ),
        min_size=1, max_size=6,
    )
)
def test_safe_row_norms_matches_numpy_on_live_rows(rows):
    import numpy as np

    from auto_vectordb_spark.functions.vector import safe_row_norms

    m = np.array(rows, dtype=np.float64)
    got = safe_row_norms(m)
    raw = np.linalg.norm(m, axis=1, keepdims=True)
    live = raw[:, 0] != 0
    assert (got[live] == raw[live]).all()
    assert np.isinf(got[~live]).all()
    # the contract: dividing never warns/NaNs, dead rows normalize to 0
    normed = m / got
    assert not np.isnan(normed).any()
    assert (normed[~live] == 0.0).all()
