"""Corpus-curation rule operators: Gopher quality rules, per-domain caps,
temperature-based domain mixing, and tokenizer-fertility reporting.

These complete the quality family (textstats.quality_score = C4-style cheap
features; quality.dsir_weights / bigram_lm_score = corpus-relative signals)
with the *rule-based* filters and *mix-shaping* samplers a pretraining
pipeline runs between dedup and packing. The reference ingests every parsed
page unconditionally (/root/reference/backend/process/parsing.py:218-289 —
no scoring, no sampling), so this whole module is a scale extension, not a
port.

Rule thresholds follow the published Gopher filters (Rae et al. 2021,
arXiv:2112.11446, App. A1.1) except where this corpus' synthetic word-soup
makes the published bound vacuous (symbols/bullets/ellipses never occur);
those rules are kept, with their constants, so real text exercises them.

Scale design
------------
* :func:`gopher_rules` is a map-only scan — pure column expressions, whole
  stage codegen, no joins, no shuffle. At 100 TB it is bandwidth-bound.
* :func:`domain_cap` is one per-group window rank (partitioned sort — never
  a global order) — the same shape as quality.domain_rebalance.
* :func:`domain_rebalance_temperature` adds one tiny groupBy (one row per
  domain) + a broadcast quota join; the corpus is scanned once.
* :func:`fertility_by_lang` is one short-key groupBy with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions.text import tokenize

# Gopher word-count window, adapted: published bound is [50, 100k]; the
# synthetic docs span 10-99 words so 50 keeps the rule live on test data
# while matching the paper's lower bound exactly.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WL = 3.0
GOPHER_MAX_MEAN_WL = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_RATIO = 0.8
# Gopher's published list is {the, be, to, of, and, that, have, with}; "a"
# is added (an equally standard function word) because the synthetic test
# vocabulary contains only {the, a} of the published set — without it the
# >=2-distinct-hits rule could never fire and the keep verdict would be
# constant (vacuous) on test data. Real corpora satisfy either list.
GOPHER_STOPWORDS = ("the", "a", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOPWORD_HITS = 2


def gopher_rules(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_ratio,
    stopword_hits, ok_*, keep) — per-document Gopher rule flags.

    Returns flags for ALL documents (filtering is the caller's one-line
    ``.filter("keep")``) so downstream reporting can audit *why* a document
    was dropped — the shape every production curation pipeline wants.
    """
    toks = tokenize(F.col(text_col))
    n_words = F.size(toks)
    total_chars = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    mean_wl = F.when(n_words > 0, total_chars / n_words).otherwise(F.lit(0.0))
    # '#' and the unicode ellipsis are the paper's symbol set
    n_sym = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[#…]", "")
    )
    symbol_ratio = F.when(n_words > 0, n_sym / n_words).otherwise(F.lit(0.0))
    n_alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    alpha_ratio = F.when(n_words > 0, n_alpha_words / n_words).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.filter(
            F.array_distinct(toks), lambda t: t.isin(*GOPHER_STOPWORDS)
        )
    )
    ok_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    ok_wl = (mean_wl >= GOPHER_MIN_MEAN_WL) & (mean_wl <= GOPHER_MAX_MEAN_WL)
    ok_sym = symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO
    ok_alpha = alpha_ratio >= GOPHER_MIN_ALPHA_WORD_RATIO
    ok_stop = stop_hits >= GOPHER_MIN_STOPWORD_HITS
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        stop_hits.alias("stopword_hits"),
        ok_words.alias("ok_word_count"),
        ok_wl.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stop.alias("ok_stopwords"),
        (ok_words & ok_wl & ok_sym & ok_alpha & ok_stop).alias("keep"),
    )


def domain_cap(
    docs: DataFrame,
    cap: int,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` documents per domain, chosen by portable hash
    order (stable under re-runs and corpus growth: a kept doc stays kept
    while its domain is under cap — the CommonCrawl-style per-host limit).

    One window rank partitioned by domain; no global sort, no join.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        H.stable_hash60(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        docs.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def domain_rebalance_temperature(
    docs: DataFrame,
    alpha: float = 0.5,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-flattened domain mix: target share of domain g is
    n_g^alpha / Σ_h n_h^alpha (alpha=1 keeps the natural mix, alpha→0 is
    uniform — the multilingual-sampling scheme of XLM-R, Conneau et al.
    2020, arXiv:1911.02116 §3). The feasible total is
    T = min_g floor(n_g / share_g); each domain keeps floor(T·share_g) docs
    by portable-hash order (deterministic, re-run stable).

    Plan: one one-row-per-domain groupBy, a broadcast of the quota table,
    and one per-domain window rank. The corpus is scanned once and never
    globally sorted.
    """
    from pyspark.sql import Window

    counts = docs.groupBy(group_col).agg(F.count("*").alias("n"))
    powed = counts.withColumn("pw", F.pow(F.col("n").cast("double"), F.lit(alpha)))
    tot = powed.agg(F.sum("pw").alias("tot"))
    share = powed.crossJoin(F.broadcast(tot)).select(
        group_col, "n", (F.col("pw") / F.col("tot")).alias("share")
    )
    feasible = share.agg(F.min(F.floor(F.col("n") / F.col("share"))).alias("t"))
    quota = share.crossJoin(F.broadcast(feasible)).select(
        group_col, F.floor(F.col("t") * F.col("share")).cast("long").alias("q")
    )
    w = Window.partitionBy(group_col).orderBy(
        H.stable_hash60(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        docs.withColumn("__rk", F.row_number().over(w))
        .join(F.broadcast(quota), group_col)
        .filter(F.col("__rk") <= F.col("q"))
        .drop("__rk", "q")
    )


def fertility_by_lang(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """(lang, n_docs, avg_tokens, avg_chars_per_token, distinct_token_est)
    — tokenizer-fertility report per language: chars/token is the classic
    fertility proxy (how many characters one token 'costs'); languages whose
    fertility is far above the corpus mean are under-served by the
    tokenizer. One short-key groupBy, map-side combined.
    """
    toks = tokenize(F.col(text_col))
    per_doc = docs.select(
        F.col(lang_col).alias("lang"),
        F.size(toks).alias("n_tok"),
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).alias("n_chr"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            # explicit exact-int64-sum / count (not avg()) — reduction-order
            # independent, bit-identical across engines (parity rule 1)
            F.round(F.sum("n_tok").cast("double") / F.count("*"), 6).alias("avg_tokens"),
            # try_divide: a language whose every doc tokenizes empty
            # reports NULL fertility instead of killing the job (ANSI)
            F.round(
                F.try_divide(F.sum("n_chr").cast("double"), F.sum("n_tok")), 6
            ).alias("avg_chars_per_token"),
        )
    )


def oov_rate_by_lang(
    docs: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """(lang, n_tokens, n_oov, n_oov_terms, oov_rate) — out-of-vocabulary
    report per language against a corpus-global top-``vocab_size`` term
    vocabulary (count DESC, term ASC — a deterministic cut). The companion
    to :func:`fertility_by_lang`: fertility says how expensive a language
    tokenizes, OOV rate says how much of it a fixed vocabulary fails to
    cover — the two inputs to vocabulary-budget allocation.

    ``oov_rate`` is an unrounded division of two exact int64 counts —
    bit-identical cross-engine (no reduction-order sensitivity, no libm).

    Scale: the vocabulary cut is TakeOrderedAndProject (k-bounded, no global
    sort materializes) and the ≤``vocab_size``-row vocab is broadcast
    against the token stream — the corpus pays one explode + one
    short-key (lang) groupBy, both map-side combined.
    """
    toks = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    vocab = (
        toks.groupBy("term")
        .agg(F.count("*").alias("__tf"))
        .orderBy(F.desc("__tf"), F.asc("term"))
        .limit(vocab_size)
        .select("term", F.lit(1).alias("__iv"))
    )
    j = toks.join(F.broadcast(vocab), "term", "left")
    oov = F.when(F.col("__iv").isNull(), 1).otherwise(0)
    return (
        j.groupBy("lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(oov).alias("n_oov"),
            F.count_distinct(
                F.when(F.col("__iv").isNull(), F.col("term"))
            ).alias("n_oov_terms"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_oov",
            "n_oov_terms",
            (F.col("n_oov").cast("double") / F.col("n_tokens").cast("double")).alias(
                "oov_rate"
            ),
        )
    )


def pack_sequences(
    docs: DataFrame,
    ctx_len: int = 512,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(source, pack_id, n_docs, n_tokens, first_doc, fill) — GPT-style
    sequence-packing plan: concatenate each source's documents in doc-id
    order and cut the token stream into fixed ``ctx_len`` windows; a doc is
    attributed to the pack where its first token lands (the deterministic
    doc-level account of concat-then-chunk packing).

    ``fill = n_tokens / ctx_len`` — exact dyadic division when ctx_len is a
    power of two; > 1.0 marks packs whose last doc straddles the boundary,
    ≪ 1.0 marks a source's tail pack (padding waste the mix planner sees).

    Scale shape: ONE window prefix-sum partitioned by source (never a
    global window) + one (source, pack_id) groupBy. A corpus dominated by
    a single giant source should switch to the two-level 256-hex-bucket
    prefix sum used by training-set token budgeting (pipeline.py:444) —
    same algebra, bucket-local windows.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.size(tokenize(F.col(text_col))).alias("n_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pos = toks.withColumn("cum_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    # exact int64 floor division (parity doctrine): a double divide + cast
    # can land on the wrong side of a pack boundary once cum_before
    # approaches 2^53 or ctx_len is not a power of two
    packed = pos.withColumn("pack_id", F.expr(f"cum_before DIV {int(ctx_len)}"))
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        (F.sum("n_tok").cast("double") / F.lit(float(ctx_len))).alias("fill"),
    )


def curation_funnel(
    docs: DataFrame,
    quality_min: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(source, stage, n_docs) — first-fail attribution funnel over the
    standard curation gauntlet: exact-dup loser → Gopher rule fail →
    quality score < ``quality_min`` → keep.

    The observability report every production curation run needs ("why did
    this source shrink 40%?"): each doc is counted at the FIRST stage that
    rejects it, so per-source stage counts sum exactly to the corpus and
    the keep row is the surviving mix. Stage keys are ordinal-prefixed
    ('1_dup' < '2_gopher' < '3_quality' < '4_keep') so the funnel sorts
    correctly in any consumer.

    Scale shape: the dup flag is one content-hash window (min doc-id per
    md5(text) — the exact_dedup shuffle); Gopher and quality flags are
    map-only rescans joined back on doc_id. Three corpus-key shuffles
    total for a once-per-run audit — acceptable altitude; fuse the three
    signal scans into one projection if the audit ever moves into the hot
    path.
    """
    from pyspark.sql import Window

    from .textstats import quality_score

    w = Window.partitionBy(F.md5(F.col(text_col)))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        (F.col(id_col) != F.min(id_col).over(w)).alias("is_dup"),
    )
    # both rule operators normalize their id column to 'doc_id'
    g = gopher_rules(docs, id_col, text_col).select("doc_id", "keep")
    q = quality_score(docs, id_col, text_col).select("doc_id", "quality")
    staged = (
        base.join(g, "doc_id")
        .join(q, "doc_id")
        .select(
            "source",
            F.when(F.col("is_dup"), F.lit("1_dup"))
            .when(~F.col("keep"), F.lit("2_gopher"))
            .when(F.col("quality") < quality_min, F.lit("3_quality"))
            .otherwise(F.lit("4_keep"))
            .alias("stage"),
        )
    )
    return staged.groupBy("source", "stage").agg(F.count(F.lit(1)).alias("n_docs"))
