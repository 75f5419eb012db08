"""Text analytics: token stats, quality, lang-id, fingerprint."""

from auto_vectordb_spark.operators import textstats as TS


def test_token_stats_values(spark):
    docs = spark.createDataFrame([(1, "a b a c"), (2, "")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in TS.token_stats(docs).collect()}
    assert out[1]["n_tokens"] == 4
    assert out[1]["n_distinct_tokens"] == 3
    assert abs(out[1]["ttr"] - 0.75) < 1e-12
    assert out[2]["n_tokens"] == 0 and out[2]["ttr"] == 0.0


def test_quality_score_bounds_and_monotonicity(spark):
    good = "the cat and the dog went to the park with friends in town today"
    bad = "!!! ??? ***"
    docs = spark.createDataFrame([(1, good), (2, bad)], ["doc_id", "text"])
    out = {r["doc_id"]: r["quality"] for r in TS.quality_score(docs).collect()}
    assert 0.0 <= out[2] < out[1] <= 1.0


def test_language_id(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is that big"),
            (2, "der hund und die katze ist nicht das problem"),
            (3, "xyzzy qwerty plugh"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["lang_guess"] for r in TS.language_id(docs).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "und"


def test_fingerprint_order_sensitive(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["fp"] for r in TS.fingerprint(docs).collect()}
    assert out[1] == out[3]  # identical token stream → same fp
    assert out[1] != out[2]  # permutation → different fp
    assert all(0 <= v < TS.FINGERPRINT_PRIME for v in out.values())


def test_chunk_text_windows_and_overlap(spark):
    from auto_vectordb_spark.operators.textstats import chunk_text

    text = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame([(1, text), (2, "short doc")], ["doc_id", "text"])
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"])
        for r in chunk_text(docs, max_tokens=4, overlap=2).collect()
    )
    # doc1: stride 2 → starts 0,2,4,6 — the last window already reaches the
    # final token, so no redundant tail chunk; doc2: one short chunk
    assert rows == [
        (1, 0, "t0 t1 t2 t3"),
        (1, 1, "t2 t3 t4 t5"),
        (1, 2, "t4 t5 t6 t7"),
        (1, 3, "t6 t7 t8 t9"),
        (2, 0, "short doc"),
    ]


def test_scrub_redacts_and_counts(spark):
    from auto_vectordb_spark.operators.textstats import scrub

    df = spark.createDataFrame(
        [(1, "mail a.b@x.com see https://ex.com/p?q=1 ref 123456 and 123")],
        ["doc_id", "text"],
    )
    r = scrub(df).collect()[0]
    assert (r["n_urls"], r["n_emails"], r["n_longnums"]) == (1, 1, 1)
    assert r["scrubbed"] == "mail <EMAIL> see <URL> ref <NUM> and 123"


def test_repetition_ratio_values(spark):
    from auto_vectordb_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "x y z w"), (3, "")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    # "a b c a b c": shingles [abc bca cab abc] -> 1 dup of 4 = 0.25;
    # tokens 6 with 3 distinct -> 0.5
    assert got[1]["n_shingles"] == 4
    assert abs(got[1]["rep_ratio"] - 0.25) < 1e-9
    assert abs(got[1]["dup_token_ratio"] - 0.5) < 1e-9
    assert got[2]["rep_ratio"] == 0.0
    assert got[3]["n_shingles"] == 0 and got[3]["rep_ratio"] == 0.0


def test_term_drift_by_source_values(spark):
    import math

    from auto_vectordb_spark.operators.textstats import term_drift_by_source

    # source A: 4x "a"; source B: 2x "a", 2x "b". Corpus: a=6, b=2, T=8.
    df = spark.createDataFrame(
        [(1, "A", "a a a a"), (2, "B", "a a b b")],
        ["doc_id", "source", "text"],
    )
    got = {r["source"]: r for r in term_drift_by_source(df).collect()}
    # KL(A||P) = 1.0 * ln(1.0 / (6/8))
    exp_a = math.log(1 / 0.75)
    # KL(B||P) = 0.5*ln(0.5/0.75) + 0.5*ln(0.5/0.25)
    exp_b = 0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
    assert got["A"]["n_terms"] == 1 and got["A"]["n_tokens"] == 4
    assert got["B"]["n_terms"] == 2 and got["B"]["n_tokens"] == 4
    assert abs(got["A"]["kl_div"] - exp_a) < 1e-6
    assert abs(got["B"]["kl_div"] - exp_b) < 1e-6
    # KL is non-negative and zero only when distributions match
    assert got["A"]["kl_div"] > 0 and got["B"]["kl_div"] > 0
    # kl_q is the bit-exact verified representation: the int64 sum of
    # 1e9-quantized contributions, with kl_div derived from it by division
    for src, exp in (("A", exp_a), ("B", exp_b)):
        assert isinstance(got[src]["kl_q"], int)
        assert abs(got[src]["kl_q"] - exp * 1e9) <= 2  # ±0.5/quantized term
        assert got[src]["kl_div"] == round(got[src]["kl_q"] / 1e9, 6)


def test_zipf_fit_known_slope(spark):
    import math

    from auto_vectordb_spark.operators.textstats import zipf_fit

    # corpus with tf counts 8/4/2/1 for terms a/b/c/d -> y = ln(tf),
    # x = ln(rank 1..4); slope of the LSQ fit computable by hand
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = zipf_fit(df).collect()[0]
    xs = [math.log(i) for i in (1, 2, 3, 4)]
    ys = [math.log(t) for t in (8, 4, 2, 1)]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert r["n_terms"] == 4
    assert abs(r["slope"] - slope) < 1e-5
    assert r["slope"] < 0  # frequency decays with rank
    # raw_sums mode emits the exact quantized regression sums (the verified
    # cross-engine representation); the same slope must be recoverable
    q = zipf_fit(df, raw_sums=True).collect()[0]
    assert q["n_terms"] == 4
    deq = {k: q[k] / 1e9 for k in ("sx_q", "sy_q", "sxx_q", "sxy_q")}
    slope_q = (n * deq["sxy_q"] - deq["sx_q"] * deq["sy_q"]) / (
        n * deq["sxx_q"] - deq["sx_q"] * deq["sx_q"]
    )
    assert abs(slope_q - slope) < 1e-5


def test_sentence_segments_order_trim_and_empties(spark):
    from auto_vectordb_spark.operators.textstats import sentence_segments

    df = spark.createDataFrame(
        [
            (1, "First one. Second two!  Third three? trailing"),
            (2, "no terminator at all"),
            (3, "Dot.    "),  # trailing whitespace-only fragment drops
        ],
        ["doc_id", "text"],
    )
    rows = sentence_segments(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["sent_idx"], r["sent"]))
    for v in by_doc.values():
        v.sort()
    assert by_doc[1] == [
        (1, "First one."),
        (2, "Second two!"),
        (3, "Third three?"),
        (4, "trailing"),
    ]
    assert by_doc[2] == [(1, "no terminator at all")]
    # "Dot." splits into ["Dot.", "   "]; the whitespace-only tail trims empty
    assert by_doc[3] == [(1, "Dot.")]


def test_sentence_segments_mid_token_period_not_split(spark):
    from auto_vectordb_spark.operators.textstats import sentence_segments

    # period NOT followed by whitespace (version number) must not split
    df = spark.createDataFrame([(1, "v1.2 shipped. done")], ["doc_id", "text"])
    sents = [r["sent"] for r in sentence_segments(df).orderBy("sent_idx").collect()]
    assert sents == ["v1.2 shipped.", "done"]


def test_vocab_growth_curve_totals_and_monotonicity(spark):
    from auto_vectordb_spark.operators import textstats as TS

    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i % 7} gamma word{i}") for i in range(40)],
        ["doc_id", "text"],
    )
    rows = sorted(TS.vocab_growth_curve(docs).collect(), key=lambda r: r["bkt"])
    # cumulative columns are non-decreasing along bucket order
    for a, b in zip(rows, rows[1:]):
        assert a["cum_tokens"] <= b["cum_tokens"]
        assert a["cum_vocab"] <= b["cum_vocab"]
    # final totals equal the corpus-wide exact numbers
    assert rows[-1]["cum_tokens"] == 40 * 5
    assert rows[-1]["cum_vocab"] == 3 + 7 + 40  # alpha/beta/gamma + doc0..6 + word0..39


def test_cooccurrence_pmi_counts_and_window(spark):
    import math

    from auto_vectordb_spark.operators import textstats as TS

    # "a b c a" -> window-2 pairs: (a,b),(a,c),(b,c),(a,b)[b+2],(a,c)[c+1]
    docs = spark.createDataFrame([(0, "a b c a")], ["doc_id", "text"])
    rows = {(r["x"], r["y"]): r for r in TS.cooccurrence_pmi(docs).collect()}
    assert rows[("a", "b")]["n_xy"] == 2
    assert rows[("a", "c")]["n_xy"] == 2
    assert rows[("b", "c")]["n_xy"] == 1
    r = rows[("b", "c")]
    assert (r["n_x"], r["n_y"]) == (1, 1)
    # pmi = ln(n_xy * n_tok^2 / (n_pairs * n_x * n_y)) quantized at 1e6
    want = round(math.log((1 * 4.0 * 4) / (5.0 * 1 * 1)) * 1e6)
    assert r["pmi_q_micro"] == want
    # a one-token doc contributes no pairs and does not crash
    one = spark.createDataFrame([(0, "solo")], ["doc_id", "text"])
    assert TS.cooccurrence_pmi(one).count() == 0


def test_token_entropy_extremes_and_python_model(spark):
    import math

    from auto_vectordb_spark.operators.textstats import token_entropy

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),       # one type -> H = 0
            (2, "a b c d e f"),                          # uniform -> H = ln(6)
            (3, "x x y"),                                # mixed
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in token_entropy(docs).collect()}
    # single-type doc: H = 0 up to the 1e-6 quantization grid (the two ln
    # terms quantize independently, so they cancel only to grid precision)
    assert out[1]["n_types"] == 1 and abs(out[1]["entropy"]) <= 1e-6
    assert abs(out[2]["entropy"] - math.log(6)) < 2e-6  # 1e6 quantization grid
    h3 = math.log(3) - (2 * math.log(2)) / 3
    assert abs(out[3]["entropy"] - h3) < 2e-6
    assert out[1]["entropy"] <= out[3]["entropy"] <= out[2]["entropy"]
    for r in out.values():
        assert r["entropy"] == (r["ln_n_q"] - r["slnc_q"] / r["n_tokens"]) / 1e6
