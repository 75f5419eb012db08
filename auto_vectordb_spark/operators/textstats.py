"""Text-analysis operators for training-data pipelines (north-star extension;
the reference's text handling is limited to cleanup transforms F3–F7,
/root/reference/backend/process/parsing.py:105-107).

All pure column expressions (JVM-side, codegen) with DuckDB oracle twins:

- :func:`token_stats` — token / distinct-token / char counts.
- :func:`quality_score` — heuristic quality features (length, punctuation
  ratio, stopword ratio, mean word length) + a composite score.
- :func:`language_id` — n-gram/stopword-hit heuristic language guess.
- :func:`fingerprint` — order-sensitive positional rolling hash of the token
  stream (documents with identical token sequences collide).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions.text import tokenize

# Tiny per-language marker lexicons. The goal is a *deterministic, cheap,
# oracle-expressible* classifier of the n-gram-heuristic family, not SOTA
# lang-id; swap in fasttext via pandas_udf for production quality.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr": ("le", "la", "les", "et", "est", "une", "des", "que"),
    "es": ("el", "la", "los", "de", "que", "es", "una", "por"),
    "zh": ("de", "shi", "zai", "le", "wo", "bu", "you", "ren"),
}

STOPWORDS_EN = LANG_MARKERS["en"]

FINGERPRINT_PRIME = 1000000007  # < 2^30: terms sum safely in int64 for any real doc


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, n_chars_text, ttr).

    ttr = type-token ratio (lexical diversity), 0 for empty docs.
    """
    toks = tokenize(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length(F.col(text_col)).alias("n_chars_text"),
        F.when(F.size(toks) > 0, F.size(F.array_distinct(toks)) / F.size(toks))
        .otherwise(F.lit(0.0))
        .alias("ttr"),
    )


def _count_in(tokens: Column, vocab: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*vocab)))


def quality_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Heuristic quality features + composite score in [0, 1].

    Features follow the C4/Gopher-style cheap filters: document length,
    mean word length, stopword ratio, punctuation density.
    score = 0.25*len_ok + 0.25*word_len_ok + 0.3*stopword_ratio_clamped
          + 0.2*(1 - punct_ratio_clamped)

    ``extra_cols`` names input columns carried through unchanged, so a
    caller can compute the score and a grouping key (e.g. md5(text)) in
    ONE map-only pass instead of a post-hoc self-join on doc_id.
    """
    toks = tokenize(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    n_stop = _count_in(toks, STOPWORDS_EN)
    mean_wl = F.when(n_tok > 0, F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / n_tok).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.0)
    wl_ok = F.when((mean_wl >= 3.0) & (mean_wl <= 12.0), 1.0).otherwise(0.0)
    score = (
        0.25 * len_ok
        + 0.25 * wl_ok
        + 0.3 * F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
        + 0.2 * (1.0 - F.least(punct_ratio * F.lit(5.0), F.lit(1.0)))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tokens"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality"),
        *[F.col(c) for c in extra_cols],
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_guess, lang_hits) — argmax of marker-lexicon hits.

    Deterministic tie-break: higher hit count wins, then lexicographic
    language code. 'und' when no marker hits at all.
    """
    toks = tokenize(F.col(text_col))
    hit_cols = [
        _count_in(toks, vocab).alias(f"hits_{lang}") for lang, vocab in sorted(LANG_MARKERS.items())
    ]
    with_hits = docs.select(F.col(id_col).alias("doc_id"), *hit_cols)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    guess = F.lit("und")
    # reversed so that earlier (lexicographically smaller) languages win ties
    for lang in reversed(langs):
        guess = F.when(
            (best > 0) & (F.col(f"hits_{lang}") == best), F.lit(lang)
        ).otherwise(guess)
    return with_hits.select("doc_id", guess.alias("lang_guess"), best.alias("lang_hits"))


def tfidf_topk_terms(
    docs: DataFrame,
    n_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    scale: int = 1_000_000,
) -> DataFrame:
    """Top-k salient terms per document by integer-exact TF-IDF-lite:

        idf_i   = (scale * (N+1)) div (df+1)      -- log-free idf surrogate
        score_i = tf * idf_i

    Monotone in tf and in 1/df like classic TF-IDF but computed entirely in
    int64 (integer div truncates identically in Spark and DuckDB), so the
    per-doc ranking is bit-identical cross-engine — a log() idf would hang
    the top-k cut on libm's last ulp (parity rules 1-2). int64 budget:
    ``scale * (N+1) * max_tf < 2^63`` → safe to N ≈ 1e9 docs at scale=1e6
    with tf ≤ 9e3; drop ``scale`` for a larger corpus.

    ``n_docs`` is the caller-supplied corpus size (one count() scalar — same
    sanctioned pattern as BM25 corpus stats, operators/bm25.py).

    Plan: explode → groupBy (doc, term) tf → document frequency as a
    COUNT window over tf partitioned by term (not a groupBy+self-join — the
    diamond would re-derive tf, scanning the corpus twice) → per-doc
    windowed top-k. One scan, three shuffles (doc-term, term, doc); nothing
    quadratic.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    scored = tf.withColumn(
        "dfr", F.count("*").over(Window.partitionBy("term"))
    ).withColumn(
        "score_i",
        (F.col("tf") * F.expr(f"{scale * (n_docs + 1)}L div (dfr + 1)")).cast("long"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_i"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "score_i", "rk")
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, fp) — order-sensitive rolling fingerprint of the token stream.

    fp = Σ_pos ( (hash60(token) mod 2^31−1)·(pos+1) mod P ) mod P with
    P = 1000000007. Position weighting makes permuted docs differ; every term
    is < 2^30 so the int64 sum is safe for docs up to ~2^33 tokens. The sum is
    order-independent to *compute* (parallel-friendly) yet order-sensitive in
    *value*. DuckDB twin uses unnest with generate_subscripts ordinality.
    """
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "token"),
    )
    h31 = H.stable_hash60(F.col("token")) % F.lit(2147483647)
    term = (h31 * (F.col("pos") + 1)) % F.lit(FINGERPRINT_PRIME)
    return exploded.select("doc_id", term.alias("t")).groupBy("doc_id").agg(
        (F.sum("t") % F.lit(FINGERPRINT_PRIME)).alias("fp")
    )


# ASCII-restricted so Spark (Java regex) and DuckDB (RE2) agree byte-for-byte;
# the unicode version swaps in \p{L}/\p{N} classes.
BPE_PIECE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"


def bpe_token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_pieces, chars_per_piece) — cost estimators.

    ``n_ws_tokens``: whitespace-split count (the classic heuristic);
    ``n_bpe_pieces``: GPT-2-style pre-tokenizer pieces (letter runs / digit
    runs / punctuation runs) — a deterministic, vocabulary-free proxy for BPE
    token counts, good enough for batch-size/cost planning; a real tokenizer
    drops into a pandas_udf with this exact signature.
    """
    ws = F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != ""))
    pieces = F.regexp_count(F.col(text_col), F.lit(BPE_PIECE_RE))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("n_ws_tokens"),
        pieces.alias("n_bpe_pieces"),
        F.when(pieces > 0, F.round(F.length(text_col) / pieces, 6))
        .otherwise(F.lit(0.0))
        .alias("chars_per_piece"),
    )


# ASCII-restricted patterns, byte-identical under Java regex and RE2 —
# the privacy-scrub analog of BPE_PIECE_RE's dialect discipline.
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONGNUM_RE = r"[0-9]{4,}"


def scrub_text(col: Column) -> Column:
    """PII/noise redaction: URLs → <URL>, emails → <EMAIL>, 4+-digit runs →
    <NUM> (ids, phones, card fragments). Order matters: URLs first (they
    contain digits and @-free hosts), then emails, then bare number runs.
    Pure regexp_replace chain — JVM codegen, no UDF."""
    out = F.regexp_replace(col, URL_RE, "<URL>")
    out = F.regexp_replace(out, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, LONGNUM_RE, "<NUM>")


def scrub(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_urls, n_emails, n_longnums, scrubbed) — redaction plus
    per-category match counts (the audit trail a compliance pass needs)."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(t, F.lit(URL_RE)).alias("n_urls"),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(LONGNUM_RE)).alias("n_longnums"),
        scrub_text(t).alias("scrubbed"),
    )


def sentence_split(text: Column) -> Column:
    """Per-row sentence array: split on sentence-final punctuation.

    RE2-portable sentinel insertion — no lookbehind exists in RE2, so
    ``([.!?])\\s+`` is rewritten to punctuation + U+0001 and the string is
    split on the sentinel. Identical regex semantics on Spark (Java regex)
    and RE2-class engines, and the exact split the DuckDB oracles mirror
    (plans/parity.py _SENTS_CTE). Row-local, zero shuffle.
    """
    return F.split(F.regexp_replace(text, r"([.!?])\s+", "$1\x01"), "\x01")


def sentence_segments(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, sent_idx, sent) — sentence segmentation, the curation
    primitive under sentence-level dedup/sampling (boilerplate removal
    operates on sentences, not k-grams).

    1-based ``sent_idx`` preserves document order for reassembly; sentences
    are trimmed and empties dropped. Row-local explode — the only data
    growth is the sentence rows themselves. Oracle-verified via the
    text_sentences parity entry (which ships sentences as md5+length, never
    text).
    """
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(sentence_split(F.col(text_col))).alias("idx0", "sent0"),
        )
        .select(
            "doc_id",
            (F.col("idx0") + 1).cast("int").alias("sent_idx"),
            F.trim(F.col("sent0")).alias("sent"),
        )
        .filter(F.col("sent") != "")
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(doc_id, n_shingles, rep_ratio, dup_token_ratio) — Gopher-style
    within-document repetition features: fraction of duplicate k-gram
    occurrences and duplicate token occurrences. High values flag boilerplate
    and degenerate generations; row-local array math, zero shuffle."""
    from ..functions.text import shingles

    toks = tokenize(F.col(text_col))
    sh = shingles(toks, k)
    n_sh, n_usp = F.size(sh), F.size(F.array_distinct(sh))
    n_tok, n_utok = F.size(toks), F.size(F.array_distinct(toks))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_sh.alias("n_shingles"),
        F.round(
            F.when(n_sh > 0, 1.0 - n_usp / n_sh.cast("double")).otherwise(0.0), 6
        ).alias("rep_ratio"),
        F.round(
            F.when(n_tok > 0, 1.0 - n_utok / n_tok.cast("double")).otherwise(0.0), 6
        ).alias("dup_token_ratio"),
    )


def chunk_text(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_text) — fixed-window token
    chunking with overlap, the canonical context-window prep transform.

    Chunk i covers tokens [i·stride, i·stride + max_tokens) with
    stride = max_tokens − overlap; the last chunk may be short; docs shorter
    than one window yield one chunk. Pure array expressions, row-local
    (1 → ceil(n/stride) rows), zero shuffle at any scale.
    """
    assert 0 <= overlap < max_tokens
    stride = max_tokens - overlap
    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    # number of chunks: 1 + ceil(max(n - max_tokens, 0) / stride)
    extra = F.greatest(n - max_tokens, F.lit(0))
    n_chunks = F.lit(1) + F.ceil(extra / F.lit(stride)).cast("int")
    starts = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.slice(toks, i * stride + 1, max_tokens).alias("ctoks"),
        ),
    )
    exploded = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(chunks).alias("c")
    ).filter(F.size("c.ctoks") > 0)
    return exploded.select(
        "doc_id",
        F.col("c.chunk_idx").cast("int").alias("chunk_idx"),
        F.size("c.ctoks").alias("n_tokens"),
        F.concat_ws(" ", F.col("c.ctoks")).alias("chunk_text"),
    )


def term_drift_by_source(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    quant_scale: int = 9,
) -> DataFrame:
    """(source, n_terms, n_tokens, kl_q, kl_div) — KL divergence of each source's
    unigram distribution against the whole-corpus distribution, the standard
    drift/mixture monitor for a multi-source training corpus (which domains
    diverge from the blend, and by how much).

    KL(P_s ‖ P) = Σ_t p_s(t)·ln(p_s(t)/p(t)); only terms present in the
    source contribute (p(t) > 0 always — the corpus is a superset).

    Output carries the divergence twice: ``kl_q`` (BIGINT, the exact int64
    sum of 10^-quant_scale-quantized contributions — the bit-exact,
    cross-engine-stable representation; kl_div = kl_q/10^quant_scale) and
    ``kl_div`` (the human-readable rounded double). Verification MUST hash
    the integer, never the double: round 4's driver run proved that a
    reconstructed ``round(Σq/1e9, 6)`` can land 4e-9 from its 6-decimal
    rounding boundary, where engine-library skew (a different DuckDB/libm
    build) flips the rounded value even though the integer sum is
    bit-identical. Quantize once, then stay in integers. Cross-engine
    verification additionally uses ``quant_scale=6`` (not the default 9):
    per-contribution absolute margins to the quantization boundary scale as
    1/10^quant_scale, so the coarser scale buys 1000x more headroom against
    a verifier engine whose ln differs at the last few ulps, while 1e-6 per
    term is still far below any drift threshold a monitor would alert on.

    Scale shape: the token stream is reduced ONCE by a (source, term)
    groupBy — the only full-corpus shuffle. Everything downstream operates
    on that reduced table: per-term corpus counts are a second (term)
    groupBy of it, per-source totals a tiny aggregate broadcast back, and
    the grand total a 1-row cross-joined aggregate — no collect, no global
    window, no second pass over the corpus.

    Determinism: the per-term double contribution is quantized to
    10^-quant_scale int64 units before the sum (parity rule 1), so Spark
    and DuckDB produce bit-identical kl_div regardless of reduce order.
    """
    toks = docs.select(
        F.col(source_col).alias("source"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    st = toks.groupBy("source", "term").agg(F.count("*").alias("c_st"))
    ct = st.groupBy("term").agg(F.sum("c_st").alias("c_t"))
    ts = st.groupBy("source").agg(F.sum("c_st").alias("t_s"))
    grand = ct.agg(F.sum("c_t").alias("t_all"))
    joined = (
        st.join(ct, "term")
        .join(F.broadcast(ts), "source")
        .crossJoin(F.broadcast(grand))
    )
    p_s = F.col("c_st").cast("double") / F.col("t_s").cast("double")
    p_t = F.col("c_t").cast("double") / F.col("t_all").cast("double")
    contrib_q = F.round(p_s * F.log(p_s / p_t) * F.lit(10.0**quant_scale)).try_cast("long")
    return (
        joined.select("source", "term", contrib_q.alias("q"))
        .groupBy("source")
        .agg(F.count("*").alias("n_terms"), F.sum("q").alias("__qsum__"))
        .join(F.broadcast(ts), "source")
        .select(
            "source",
            "n_terms",
            F.col("t_s").alias("n_tokens"),
            F.col("__qsum__").alias("kl_q"),
            F.round(F.col("__qsum__").cast("double") / F.lit(10.0**quant_scale), 6).alias(
                "kl_div"
            ),
        )
    )


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 100,
    quant_scale: int = 9,
    raw_sums: bool = False,
) -> DataFrame:
    """One-row (n_terms, slope, intercept) — least-squares fit of
    ln(term_frequency) against ln(rank) over the top-``top_n`` vocabulary,
    the Zipf-law health check for a text corpus (natural text ≈ -1 slope;
    boilerplate-heavy or synthetic corpora drift off it).

    With ``raw_sums=True`` the row is instead the exact int64-quantized
    regression sums (n_terms, sx_q, sy_q, sxx_q, sxy_q) — the bit-exact
    cross-engine representation (slope = (n·sxy − sx·sy)/(n·sxx − sx²) on
    the dequantized values). Verification hashes THIS form: a final
    ``round(slope, 6)`` reconstructed from the sums is one engine-library
    version away from a rounding-boundary flip (see term_drift_by_source).

    Scale shape: vocabulary reduction is the same one (term) shuffle the
    BM25 index pays; the top-N cut is TakeOrderedAndProject (no global
    sort materializes); ranking happens INSIDE one collected struct array
    (≤ top_n elements) — no unpartitioned window, nothing the driver ever
    sees. Regression sums are int64-quantized per term (parity rule 1).
    """
    toks = docs.select(F.explode(tokenize(F.col(text_col))).alias("term"))
    vocab = toks.groupBy("term").agg(F.count("*").alias("tf"))
    top = vocab.orderBy(F.desc("tf"), F.asc("term")).limit(top_n)
    q = 10.0**quant_scale
    ranked = (
        top.agg(F.collect_list(F.struct(F.col("tf"), F.col("term"))).alias("a"))
        # rank inside the one collected row: (tf DESC, term ASC) — the same
        # ordering key as the oracle's row_number
        .select(
            F.posexplode(
                F.expr(
                    "array_sort(a, (l, r) -> CASE WHEN l.tf > r.tf THEN -1 "
                    "WHEN l.tf < r.tf THEN 1 WHEN l.term < r.term THEN -1 "
                    "WHEN l.term > r.term THEN 1 ELSE 0 END)"
                )
            ).alias("i", "e")
        )
        .select(
            (F.col("i") + 1).cast("double").alias("rank"),
            F.col("e.tf").cast("double").alias("tf"),
        )
    )
    x, y = F.log("rank"), F.log("tf")
    sums = ranked.agg(
        F.count("*").alias("n"),
        F.sum(F.round(x * F.lit(q)).try_cast("long")).alias("sx"),
        F.sum(F.round(y * F.lit(q)).try_cast("long")).alias("sy"),
        F.sum(F.round(x * y * F.lit(q)).try_cast("long")).alias("sxy"),
        F.sum(F.round(x * x * F.lit(q)).try_cast("long")).alias("sxx"),
    )
    if raw_sums:
        return sums.select(
            F.col("n").alias("n_terms"),
            F.col("sx").alias("sx_q"),
            F.col("sy").alias("sy_q"),
            F.col("sxx").alias("sxx_q"),
            F.col("sxy").alias("sxy_q"),
        )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx") / F.lit(q), F.col("sy") / F.lit(q)
    sxy, sxx = F.col("sxy") / F.lit(q), F.col("sxx") / F.lit(q)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return sums.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


def vocab_growth_curve(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heaps-law vocabulary-growth curve V(n) over a deterministic corpus
    permutation, at 256-bucket granularity — the companion health check to
    :func:`zipf_fit` (natural text grows V ≈ K·n^β with β ≈ 0.4–0.6;
    template/boilerplate corpora flatten early, synthetic ID-heavy corpora
    grow linearly).

    Document order is md5(id) — the same shuffle-proof pseudo-random
    permutation as ``pipeline.build_training_set`` — coarsened to its first
    2 hex chars: 256 *contiguous ranges* of the global order (hex strings of
    equal length sort lexicographically = numerically). Per bucket the row
    is (bkt, cum_tokens, cum_vocab): cumulative token count and cumulative
    distinct-vocabulary size, where a term counts toward the bucket of its
    FIRST occurrence in permutation order. All-integer output → bit-exact
    cross-engine; consumers fit ln V = ln K + β·ln n off the curve.

    Scale shape: one explode+groupBy(term) shuffle for first-occurrence
    buckets (map-side combine crushes repeats), one ≤256-group token-count
    aggregate; the cumulative window runs over the ≤256-row reduced join —
    a whitelisted single-partition funnel, never the corpus. A global
    row-number over docs (the naive Heaps formulation) would serialize the
    corpus through one task; the bucket coarsening is what removes it.
    """
    from pyspark.sql.window import Window

    toks = tokenize(F.col(text_col))
    d = docs.select(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 2).alias("bkt"),
        toks.alias("__toks"),
    )
    per_bucket = d.groupBy("bkt").agg(F.sum(F.size("__toks")).alias("__toks_b"))
    first_seen = (
        d.select("bkt", F.explode("__toks").alias("term"))
        .groupBy("term")
        .agg(F.min("bkt").alias("fb"))
    )
    new_terms = first_seen.groupBy(F.col("fb").alias("bkt")).agg(
        F.count("*").alias("__new_b")
    )
    j = per_bucket.join(new_terms, "bkt", "left").select(
        "bkt", "__toks_b", F.coalesce("__new_b", F.lit(0)).alias("__new_b")
    )
    w = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, 0)
    return j.select(
        "bkt",
        F.sum("__toks_b").over(w).alias("cum_tokens"),
        F.sum("__new_b").over(w).alias("cum_vocab"),
    )


def cooccurrence_pmi(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 2,
    top_n: int = 50,
    quant_scale: int = 6,
) -> DataFrame:
    """Top-``top_n`` co-occurring term pairs (skip-gram window ≤ ``window``)
    with pointwise mutual information — the classic association statistic
    (collocations, word2vec-era negative-sampling tables, phrase mining):

        pmi(x, y) = ln( p(x,y) / (p(x)·p(y)) )
                  = ln( n_xy · n_tok² / (n_pairs · n_x · n_y) )

    Pairs are generated ROW-LOCALLY from the token array (nested
    sequence/transform column expressions — never a positional self-join,
    whose per-doc L² fan-out is the scale-killer for long documents), with
    (x, y) ordered lexicographically so symmetric co-occurrences merge.
    The cut ranks exact integer counts (n_xy DESC, x, y) →
    TakeOrderedAndProject, deterministic cross-engine. ``pmi_q_micro``
    quantizes the single ln at 1e6 (the bigram_lm_nll discipline): its
    argument is an IEEE-exact-ordered product/ratio of exact integer
    counts, identical in both engines to the last bit before the one libm
    call.

    Scale: one corpus scan (pairs + unigrams come from the same tokenize),
    one (x, y) shuffle with map-side combine, broadcast 1-row totals.
    """
    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    empty = F.array().cast("array<struct<x:string,y:string>>")

    # Skip-gram pairs as zip_with over shifted SLICES, not nested
    # transform+element_at: every element_at reference embeds its own copy
    # of the tokenize expression, and higher-order lambdas evaluate
    # interpreted — the regex split re-ran O(tokens·window) times per row
    # (measured 46.8 s → 10.6 s cold / 5.3 s warm at sf0.1/local[8]; the
    # residual is the two 1-row total aggregates). The slice form copies
    # tokenize O(window) times per row and yields the identical pair set:
    # distance-d pairs are zip(toks[1..n−d], toks[1+d..n]).
    def pairs_at(d: int):
        return F.when(
            n > d,
            F.zip_with(
                F.slice(toks, 1, n - d),
                F.slice(toks, 1 + d, n - d),
                lambda x, y: F.struct(
                    F.least(x, y).alias("x"), F.greatest(x, y).alias("y")
                ),
            ),
        ).otherwise(empty)

    pairs_arr = F.concat(*[pairs_at(d) for d in range(1, window + 1)])
    prs = docs.select(F.explode(pairs_arr).alias("p")).select("p.x", "p.y")
    uni = docs.select(F.explode(toks).alias("term"))
    n_x = uni.groupBy("term").agg(F.count("*").alias("n_term"))
    tot = uni.agg(F.count("*").alias("__n_tok"))
    ptot = prs.agg(F.count("*").alias("__n_pairs"))
    top = (
        prs.groupBy("x", "y")
        .agg(F.count("*").alias("n_xy"))
        .orderBy(F.desc("n_xy"), F.asc("x"), F.asc("y"))
        .limit(top_n)
    )
    # the ≤top_n-row side is ALWAYS the broadcast build side; the vocab
    # table (corpus-sized at 100 TB) streams through both probe joins
    t1 = (
        n_x.withColumnRenamed("term", "x")
        .join(F.broadcast(top), "x")
        .withColumnRenamed("n_term", "n_x")
    )
    j = (
        n_x.withColumnRenamed("term", "y")
        .join(F.broadcast(t1), "y")
        .withColumnRenamed("n_term", "n_y")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ptot))
    )
    ratio = (
        F.col("n_xy").cast("double") * F.col("__n_tok") * F.col("__n_tok")
    ) / (F.col("__n_pairs").cast("double") * F.col("n_x") * F.col("n_y"))
    return j.select(
        "x",
        "y",
        "n_xy",
        "n_x",
        "n_y",
        F.round(F.log(ratio) * F.lit(10**quant_scale)).try_cast("long").alias(
            "pmi_q_micro"
        ),
    )


def token_entropy(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, n_types, slnc_q, ln_n_q, entropy) — Shannon
    entropy of each document's token distribution:

        H = ln(n) − (Σ_i c_i·ln(c_i)) / n        (nats)

    The spam/boilerplate signal the ratio features of quality_score miss:
    keyword-stuffed or template text has low entropy at normal length;
    H = 0 means one token repeated. Docs with zero tokens are absent.

    Cross-engine discipline: both ln terms are 1e6-quantized int64 columns
    (``slnc_q`` summed per row BEFORE reduction — parity rule 1 — and
    ``ln_n_q`` a single per-row quantization), so the hashed values are
    exact integers; ``entropy`` is rebuilt UNROUNDED from those integers
    ((ln_n_q − slnc_q/n)/1e6 — identical IEEE ops on identical inputs),
    never a display-rounded reconstruction (the term_drift hazard class).

    Scale shape: one (doc, term) shuffle with map-side combine, then one
    doc-keyed reduce — the same two-stage profile as TF-IDF.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokenize(F.col(text_col))).alias("term")
    )
    c = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    per = c.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(
            F.round(F.col("c") * F.log(F.col("c").cast("double")) * 1_000_000, 0).cast(
                "long"
            )
        ).alias("slnc_q"),
    )
    ln_n_q = F.round(F.log(F.col("n_tokens").cast("double")) * 1_000_000, 0).try_cast("long")
    return per.select(
        "doc_id",
        "n_tokens",
        "n_types",
        "slnc_q",
        ln_n_q.alias("ln_n_q"),
        (
            (
                ln_n_q.cast("double")
                - F.col("slnc_q").cast("double") / F.col("n_tokens").cast("double")
            )
            / F.lit(1_000_000.0)
        ).alias("entropy"),
    )
