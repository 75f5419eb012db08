"""BM25 lexical retrieval as pure DataFrame algebra (reference V3 —
ES ``match`` on page_content, /root/reference/backend/process/
elasticsearch_index.py:249-258, which delegates scoring to Lucene).

Design (scale-first):

- **Index build** (:func:`build_index`): one pass over the corpus →
  (a) ``postings``: (term, doc_id, tf) — the exploded term-frequency table,
  partitionable by term; (b) ``doc_lens``: (doc_id, dl);
  (c) ``stats``: broadcast-sized scalars (N, avgdl) + per-term df.
  At 100 TB the postings table is the only big artifact and it shuffles
  exactly once (the groupBy(term, doc_id)); df/avgdl are map-side-combined
  aggregates.

- **Query** (:func:`search`): query terms (tiny) are broadcast-joined against
  postings — a semi-join that prunes the postings scan to matching terms
  (partition pruning when postings are written partitioned/bucketed by term)
  — then scored with the BM25 formula and top-k'd per query. The corpus is
  never re-scanned at query time.

Lucene's BM25: idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)), k1=1.2, b=0.75.
Identical formula in the DuckDB oracle (plans/parity.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize
from .relational import top_k_per_group

K1 = 1.2
B = 0.75


@dataclass
class BM25Index:
    postings: DataFrame   # (term, doc_id, tf)
    doc_lens: DataFrame   # (doc_id, dl)
    term_df: DataFrame    # (term, df)
    stats: DataFrame      # ONE row: (__n double, __avgdl double)

    # Corpus scalars stay a lazy DataFrame so that building an index and
    # scoring with it is ONE Spark job (stats ride into the query plan as a
    # broadcast 1-row cross join — measured ~0.3 s faster per query than a
    # collect at build time). The properties below collect on first access
    # for callers that genuinely want the numbers.
    _scalars: tuple[int, float] | None = None

    def _fetch(self) -> tuple[int, float]:
        if self._scalars is None:
            row = self.stats.collect()[0]
            self._scalars = (int(row["__n"]), float(row["__avgdl"]))
        return self._scalars

    @property
    def n_docs(self) -> int:
        return self._fetch()[0]

    @property
    def avgdl(self) -> float:
        return self._fetch()[1]


def _stats_of(doc_lens: DataFrame) -> DataFrame:
    """1-row (__n, __avgdl) aggregate — cheap scan, no explode. avg over
    int64 dl is exact in both engines; count cast to double is exact to
    2^53 docs."""
    return doc_lens.agg(
        F.count("*").cast("double").alias("__n"), F.avg("dl").alias("__avgdl")
    )


def build_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", cache: bool = False
) -> BM25Index:
    """One corpus pass, zero actions. ``doc_lens`` is computed per-row as
    the token-array size — zero shuffle — and only postings pays the
    (term, doc_id) shuffle. Within a single query job Spark's
    ReusedExchange serves term_df and the query join from one postings
    computation; pass ``cache=True`` when the index is queried repeatedly
    (e.g. the pipeline facade).

    Measured dead-end (don't retry): pre-fanning an under-parallelized
    corpus scan (dedup.fan_out_small_scan) is SLOWER here — min-of-5
    0.91 s as-is vs 1.14 s fanned at sf0.1/local[32]. Unlike the shingle
    +md5 front ends, tokenize+explode is cheap and the postings groupBy's
    map-side combine crushes the token stream before its shuffle, so the
    extra round-robin exchange costs more than the single-core stage it
    parallelizes."""
    toks = tokenize(F.col(text_col))
    tokens = docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
    postings = tokens.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    # dl > 0 filter ≡ "docs with ≥1 token": identical population to a
    # count-over-exploded-tokens doc_lens (the oracle's definition).
    doc_lens = docs.select(F.col(id_col).alias("doc_id"), F.size(toks).alias("dl")).filter(
        F.col("dl") > 0
    )
    term_df = postings.groupBy("term").agg(F.count("*").alias("df"))
    if cache:
        postings = postings.cache()
        doc_lens = doc_lens.cache()
        term_df = term_df.cache()
    return BM25Index(postings, doc_lens, term_df, _stats_of(doc_lens))


def score_terms(index: BM25Index, query_terms: DataFrame) -> DataFrame:
    """(query_id, doc_id, score) for every doc matching ≥1 query term.

    ``query_terms``: (query_id, term) — distinct terms per query, tiny →
    broadcast. The join prunes postings to query terms before any math;
    corpus stats arrive as a broadcast 1-row cross join, so the whole
    search is one job with no prior collect.
    """
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    qt = F.broadcast(query_terms.select("query_id", "term").distinct())
    matched = (
        qt.join(index.postings, "term")
        .join(F.broadcast(index.term_df), "term")
        .join(index.doc_lens, "doc_id")
        .crossJoin(F.broadcast(index.stats))
    )
    tf, dl = F.col("tf").cast("double"), F.col("dl").cast("double")
    score = idf * (
        tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / F.col("__avgdl")))
    )
    return matched.select(
        "query_id", "doc_id", score.alias("term_score")
    ).groupBy("query_id", "doc_id").agg(F.sum("term_score").alias("score"))


def search(index: BM25Index, queries: DataFrame, k: int = 10) -> DataFrame:
    """Top-k per query. ``queries``: (query_id, query_text)."""
    terms = queries.select(
        "query_id", F.explode(tokenize(F.col("query_text"))).alias("term")
    )
    scored = score_terms(index, terms)
    return top_k_per_group(scored, ["query_id"], "score", k, tie_break="doc_id")


def score_terms_adhoc(
    docs: DataFrame,
    query_terms: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """:func:`score_terms` semantics WITHOUT a prebuilt index — the right
    plan when the index is not persisted (one-shot search over a corpus).

    Scores are bit-identical to the index path; the plan is materially
    better for the one-shot case:

    - the exploded token stream is **broadcast-pruned to query terms BEFORE
      the (term, doc_id) shuffle** — the full-corpus postings shuffle that
      ``build_index`` pays never happens, only matching rows move;
    - per-term df comes from a window over the pruned tf table (df of a
      query term only needs rows for that term — prune-invariant), so there
      is no term_df branch re-deriving postings (the diamond that made the
      index path recompute its corpus scan);
    - N / avgdl still come from the cheap no-explode corpus scan (global by
      definition; a broadcast 1-row cross join, no collect — the whole
      search is one job).

    Net: 2 corpus scans (1 stats, 1 explode+prune) and a query-sized
    shuffle, vs the index path's explode shuffle + recompute. At 100 TB
    with a *persisted* postings table, prefer build_index(cache)/score_terms
    — this operator is for when no index exists.
    """
    from pyspark.sql import Window

    from .dedup import fan_out_small_scan

    # tokenize is the expensive per-row stage and this plan runs it in
    # three legs (explode, doc_lens join, stats agg); fan an under-split
    # scan once so all three parallelize — conditional, no-op on a
    # well-partitioned 100 TB corpus (same fix as every dedup front end)
    docs = fan_out_small_scan(docs)
    toks = tokenize(F.col(text_col))
    doc_lens = docs.select(F.col(id_col).alias("doc_id"), F.size(toks).alias("dl")).filter(
        F.col("dl") > 0
    )
    qterms = F.broadcast(query_terms.select("term").distinct())
    tokens = docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
    tf_table = (
        tokens.join(qterms, "term")  # broadcast semi-prune, pre-shuffle
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    with_df = tf_table.withColumn("df", F.count("*").over(Window.partitionBy("term")))
    qt = F.broadcast(query_terms.select("query_id", "term").distinct())
    matched = (
        qt.join(with_df, "term")
        .join(doc_lens, "doc_id")
        .crossJoin(F.broadcast(_stats_of(doc_lens)))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf, dl = F.col("tf").cast("double"), F.col("dl").cast("double")
    score = idf * (
        tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / F.col("__avgdl")))
    )
    return matched.select(
        "query_id", "doc_id", score.alias("term_score")
    ).groupBy("query_id", "doc_id").agg(F.sum("term_score").alias("score"))


def index_from_dir(spark, index_dir: str, cache: bool = False) -> BM25Index:
    """Open a :class:`BM25Index` over the append-only artifacts written by
    ``streaming.pipeline.incremental_bm25_index`` — latest epoch wins per
    doc (ES ``_id`` overwrite semantics, /root/reference/backend/process/
    elasticsearch_index.py:141).

    The latest-epoch resolution is a (doc_id) groupBy over doc_lens — the
    SMALL artifact (one row per doc version, no terms) — semi-joined back
    into postings. Postings, the big artifact, pays one equi-join on its
    natural read and is never shuffled on a new key when it is stored
    partitioned by doc_id hash. Scores from this index are bit-identical to
    a from-scratch :func:`build_index` over the logically-current corpus
    (gated in tests/test_streaming.py).
    """
    lens_all = spark.read.parquet(f"{index_dir}/doc_lens")
    post_all = spark.read.parquet(f"{index_dir}/postings")
    latest = lens_all.groupBy("doc_id").agg(F.max("epoch").alias("epoch"))
    # dropDuplicates absorbs a crash-replayed epoch: a foreachBatch retry
    # appends a second IDENTICAL copy of the batch's rows, and without the
    # dedup every doc length (and every tf) of that epoch would count twice,
    # silently doubling scores. With it, replays are true no-ops.
    doc_lens = (
        lens_all.join(latest, ["doc_id", "epoch"])
        .dropDuplicates(["doc_id"])
        .select("doc_id", "dl")
    )
    postings = (
        post_all.join(latest, ["doc_id", "epoch"])
        .dropDuplicates(["doc_id", "term"])
        .select("term", "doc_id", "tf")
    )
    term_df = postings.groupBy("term").agg(F.count("*").alias("df"))
    if cache:
        postings = postings.cache()
        doc_lens = doc_lens.cache()
        term_df = term_df.cache()
    return BM25Index(postings, doc_lens, term_df, _stats_of(doc_lens))


def compact_index(spark, index_dir: str) -> dict[str, int]:
    """LSM-style compaction of the append-only incremental index: rewrite
    ``postings/`` and ``doc_lens/`` keeping ONLY each doc's latest epoch
    (and one physical copy of it — crash-replayed duplicate appends are
    squashed too). This is the maintenance job the append-only layout
    assumes (streaming.pipeline.incremental_bm25_index): without it, every
    re-index of a doc grows the artifacts and the reader's latest-epoch
    resolution pays read amplification proportional to the overwrite count.

    Epoch values are PRESERVED, not reset: foreachBatch epochs are
    monotonically increasing under one checkpoint, so a post-compaction
    append still supersedes the compacted rows for its doc ids — gated in
    tests/test_streaming.py.

    Run this with the ingest stream stopped (or between micro-batches, from
    the same maintenance scheduler that owns small-file compaction,
    sources/files.py compact_table): the swap is rename-atomic per artifact
    but appends that land between the read and the swap would be lost.

    At 100 TB this is one (doc_id, epoch) equi-join per artifact — postings,
    the big side, shuffles once on its natural key; ``latest`` (one row per
    LIVE doc — not per version, not per term) is the small side of both
    joins but still per-doc, so it is left to AQE to broadcast or shuffle
    rather than forced (a billion-doc corpus must not be driver-collected).

    Returns row counts {postings_before, postings_after, doc_lens_before,
    doc_lens_after} so schedulers can log the reclaimed amplification.
    """
    import shutil
    from pathlib import Path

    lens_all = spark.read.parquet(f"{index_dir}/doc_lens")
    post_all = spark.read.parquet(f"{index_dir}/postings")
    counts = {"doc_lens_before": lens_all.count(), "postings_before": post_all.count()}
    latest = lens_all.groupBy("doc_id").agg(F.max("epoch").alias("epoch"))
    doc_lens = (
        lens_all.join(latest, ["doc_id", "epoch"])
        .dropDuplicates(["doc_id"])
        .select("doc_id", "dl", "epoch")
    )
    postings = (
        post_all.join(latest, ["doc_id", "epoch"])
        .dropDuplicates(["doc_id", "term"])
        .select("doc_id", "term", "tf", "epoch")
    )
    base = Path(index_dir)
    jobs = (("doc_lens", doc_lens), ("postings", postings))
    # Materialize BOTH staging writes before swapping EITHER artifact: the
    # postings plan joins `latest` (derived from doc_lens), so swapping
    # doc_lens first would pull the files out from under the postings job.
    for name, df in jobs:
        df.write.mode("overwrite").parquet(str(base / f"_{name}_compact"))
    for name, _ in jobs:
        # Aside-rename ordering: live -> _old (atomic), staging -> live
        # (atomic), then delete _old. Each rename is atomic, but BETWEEN
        # the two the live path is briefly absent — a concurrent reader in
        # that window sees a missing directory, and a crash there requires
        # manually renaming _old back. Readers that must never observe a
        # missing path need a versioned-directory or symlink-flip scheme
        # on a filesystem that supports it; for batch maintenance windows
        # (the intended use) this brief gap is acceptable.
        final = base / name
        old = base / f"_{name}_old"
        if old.exists():
            shutil.rmtree(old)
        final.rename(old)
        (base / f"_{name}_compact").rename(final)
        shutil.rmtree(old)
        spark.catalog.refreshByPath(str(final))
    counts["doc_lens_after"] = spark.read.parquet(f"{index_dir}/doc_lens").count()
    counts["postings_after"] = spark.read.parquet(f"{index_dir}/postings").count()
    return counts


def prf_expansion(
    index: BM25Index,
    query_terms: DataFrame,
    fb_docs: int = 10,
    fb_terms: int = 5,
) -> DataFrame:
    """(query_id, term, fb_tf, fb_df) — pseudo-relevance-feedback expansion
    terms (RM1 family, counts-only weighting): run BM25, take the top
    ``fb_docs`` feedback docs per query, and surface the ``fb_terms``
    most-frequent terms of those docs that are NOT already query terms.

    The classic recall lever of a lexical search stack (Rocchio/RM); the
    output feeds a second score_terms pass with the expanded term set.
    Weighting is the exact integer feedback term frequency (fb_tf, ties
    broken by term ASC) — deterministic cross-engine with no float in the
    cut; fb_df (how many feedback docs contain the term) rides along for
    interpolation downstream.

    Scale shape: the feedback-doc cut is the windowed top-k on rounded
    scores (rank BEFORE joining postings back, so the postings re-join is
    pruned to q×fb_docs docs); original-term exclusion is a broadcast
    left-anti on the tiny query set. The corpus postings table is touched
    twice but shuffles only on its native keys.
    """
    from .relational import top_k_per_group

    scored = score_terms(index, query_terms).withColumn("score", F.round("score", 6))
    top = top_k_per_group(scored, ["query_id"], "score", fb_docs, tie_break="doc_id")
    cand = (
        top.select("query_id", "doc_id")
        .join(index.postings, "doc_id")
        .join(
            F.broadcast(query_terms.select("query_id", "term").distinct()),
            ["query_id", "term"],
            "left_anti",
        )
    )
    agg = cand.groupBy("query_id", "term").agg(
        F.sum("tf").alias("fb_tf"), F.countDistinct("doc_id").alias("fb_df")
    )
    return top_k_per_group(agg, ["query_id"], F.col("fb_tf").cast("long"), fb_terms, tie_break="term")
