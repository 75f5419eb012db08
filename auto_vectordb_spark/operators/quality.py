"""Corpus-level quality / data-mixing operators for training-set curation:
DSIR-style importance weights, n-gram LM scoring, and domain rebalancing.

These extend the per-document heuristics in :mod:`textstats` (length /
punctuation / stopword ratios) with *corpus-relative* signals — the ones a
100 TB pretraining pipeline actually ranks and samples by (cf. DSIR, Xie et
al. 2023, arXiv:2302.03169; CCNet's LM-perplexity filter, Wenzek et al.
2019). The reference has no corpus-level statistics at all (it scores
nothing; backend/process/parsing.py ingests every page) — this is a scale
extension, not a port.

Scale design
------------
* Every operator is (token explode → short-key groupBy with map-side
  combine → broadcast-join the tiny model back). Token/bigram count tables
  are vocabulary-sized, orders of magnitude smaller than the corpus; the
  corpus itself is scanned once and never shuffled on a wide key.
* Log-probabilities are rounded per token (1e-6) and summed as exact int64
  (parity rule 1) — deterministic across engines and reduction orders.
* :func:`domain_rebalance` is fully declarative (two window functions over
  source partitions + one broadcast join of per-source quotas); the sample
  is hash-ordered, so re-runs and incremental extensions are reproducible
  (same contract as relational.deterministic_sample).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions.text import tokenize


class EmptyTrainingSliceError(ValueError):
    """Raised by :func:`train_quality_classifier` when the labeled slice has
    zero rows: training on nothing has no degenerate model, and the caller —
    not the operator — decides whether to degrade (score nothing) or abort.
    A dedicated type so callers can catch EXACTLY this condition instead of
    message-matching ValueError text (the r8 stopgap, ADVICE r7)."""

_Q = 1_000_000  # log-prob quantization (6 decimals, exact int64 sums)


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term"))


def dsir_weights(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, weight_q_micro, weight) — hashed-unigram importance
    weight of each document toward a target domain:
    w(d) = Σ_t [ln p_target(t) − ln p_raw(t)], add-one smoothed over the
    joint vocabulary (DSIR §2.2 with unigram features).

    ``weight_q_micro`` is the exact int64 sum of 1e-6-quantized per-term
    log-ratios — the bit-exact cross-engine representation verification
    hashes (weight = weight_q_micro/1e6 is derived for human use; see
    textstats.term_drift_by_source for why doubles rebuilt from quantized
    sums must never be the verified column).

    ``target_pred`` selects the in-domain rows (e.g. ``F.col("lang")=="en"``
    or a curated id list). Docs that look like the target get weight > 0 and
    are favored by importance resampling.

    One (term) shuffle builds the two count tables in a single pass (count +
    conditional count); the resulting vocabulary table is broadcast back —
    the corpus is never shuffled.
    """
    toks = docs.select(F.col(id_col), target_pred.alias("__tgt")).join(
        _doc_tokens(docs, id_col, text_col), id_col
    )
    vocab = toks.groupBy("term").agg(
        F.count("*").alias("c_raw"),
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("c_tgt"),
    )
    totals = vocab.agg(
        F.sum("c_raw").alias("n_raw"), F.sum("c_tgt").alias("n_tgt"), F.count("*").alias("v")
    )
    scored = vocab.crossJoin(F.broadcast(totals)).select(
        "term",
        F.round(
            (
                F.log((F.col("c_tgt") + 1).cast("double") / (F.col("n_tgt") + F.col("v")))
                - F.log((F.col("c_raw") + 1).cast("double") / (F.col("n_raw") + F.col("v")))
            )
            * _Q
        )
        .cast("long")
        .alias("qlr"),
    )
    per_doc = (
        _doc_tokens(docs, id_col, text_col)
        .join(F.broadcast(scored), "term")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_tokens"), F.sum("qlr").alias("qw"))
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        F.col("qw").alias("weight_q_micro"),
        (F.col("qw").cast("double") / _Q).alias("weight"),
    )


def bigram_lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bigrams, nll_q_micro, nll) — average negative
    log-likelihood of each document under an add-one-smoothed bigram LM
    trained on the corpus itself (the CCNet-style fluency filter: high nll
    = atypical/garbled text, low nll = repetitive boilerplate).

    ``nll_q_micro`` is the exact int64 sum of 1e-6-quantized per-bigram
    −ln P terms — the bit-exact cross-engine column verification hashes
    (nll = nll_q_micro/(n_bigrams·1e6) rounded, derived for human use).

    −ln P(w2|w1) = −ln (c(w1 w2)+1) + ln (c(w1)+V); both count tables come
    out of one token explode, and scoring re-joins them broadcast. The only
    wide operation is the (bigram) groupBy — vocabulary-sized, map-side
    combined.
    """
    from ..functions.text import shingles

    bg = docs.select(
        F.col(id_col),
        F.explode(shingles(tokenize(F.col(text_col)), k=2)).alias("bigram"),
    ).withColumn("w1", F.split(F.col("bigram"), " ")[0])
    bigram_counts = bg.groupBy("bigram").agg(F.count("*").alias("c2"))
    unigram_counts = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    v = bg.agg(F.countDistinct("w1").alias("v"))
    model = (
        bigram_counts.withColumn("w1", F.split(F.col("bigram"), " ")[0])
        .join(unigram_counts, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "bigram",
            F.round(
                (F.log((F.col("c1") + F.col("v")).cast("double")) - F.log((F.col("c2") + 1).cast("double")))
                * _Q
            )
            .cast("long")
            .alias("qnll"),
        )
    )
    per_doc = (
        bg.join(F.broadcast(model), "bigram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_bigrams"), F.sum("qnll").alias("q"))
    )
    return per_doc.select(
        id_col,
        "n_bigrams",
        F.col("q").alias("nll_q_micro"),
        F.round(F.col("q").cast("double") / (F.col("n_bigrams") * _Q), 6).alias("nll"),
    )


def domain_rebalance(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    shares: dict[str, float] | None = None,
) -> DataFrame:
    """Deterministic down-sample to a target domain mix.

    With no ``shares`` the target is a uniform mix: every group keeps
    ``min_g count(g)`` docs (the largest uniform mix the data supports).
    With explicit shares {group: fraction}, the feasible total is
    ``T = min_g floor(count_g / share_g)`` and each group keeps
    ``floor(T · share_g)``.

    Membership is the ``top-quota by portable hash`` per group — stable
    under re-runs and under corpus growth (a doc already selected stays
    selected while its group's quota holds). Plan: one per-group window
    rank (partitioned sort, no global order) + a broadcast quota join.
    """
    from pyspark.sql import Window

    counts = docs.groupBy(group_col).agg(F.count("*").alias("n"))
    if shares is None:
        quota = counts.crossJoin(
            F.broadcast(counts.agg(F.min("n").alias("q")))
        ).select(group_col, "q")
    else:
        spark = docs.sparkSession
        sh = spark.createDataFrame(
            [(k, float(v)) for k, v in shares.items()], f"{group_col} string, share double"
        )
        with_share = counts.join(F.broadcast(sh), group_col)
        feasible = with_share.agg(
            F.min(F.floor(F.col("n") / F.col("share"))).alias("t")
        )
        quota = with_share.crossJoin(F.broadcast(feasible)).select(
            group_col, F.floor(F.col("t") * F.col("share")).cast("long").alias("q")
        )
    w = Window.partitionBy(group_col).orderBy(H.stable_hash60(F.col(id_col).cast("string")), F.col(id_col))
    ranked = docs.withColumn("__rk", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(quota), group_col)
        .filter(F.col("__rk") <= F.col("q"))
        .drop("__rk", "q")
    )


def train_quality_classifier(
    labeled_docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    num_features: int = 4096,
    max_iter: int = 20,
    reg_param: float = 0.01,
):
    """Model-based quality filter — the fastText-classifier step of modern
    curation recipes (CCNet, RefinedWeb, LLaMA data): hashed bag-of-tokens
    features → logistic regression, trained on whatever labels the caller
    supplies (human judgments, weak labels from rule packs like
    curation.gopher_rules, 'looks like Wikipedia' contrasts).

    Returns a fitted pyspark.ml PipelineModel (HashingTF → LogisticRegression).

    100 TB shape: HashingTF is a map-only transform (no vocabulary build, no
    shuffle); LogisticRegression training is MLlib L-BFGS — per iteration
    one treeAggregate of a ``num_features``-dim gradient, the corpus is
    scanned, never shuffled. Scoring (:func:`score_quality_classifier`) is
    broadcast-coefficients map-only. Keep ``num_features`` modest (2^12-2^18):
    the driver holds one dense gradient of that size per iteration.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    from ..functions.text import tokenize

    # coalesce: HashingTF NPEs on a NULL token array (null text), and a
    # null-text doc must fail the row, not the fit — it featurizes as the
    # empty bag
    prepped = labeled_docs.withColumn(
        "__toks",
        F.coalesce(tokenize(F.col(text_col)), F.array().cast("array<string>")),
    )
    if prepped.isEmpty():
        # training on zero examples has no degenerate model — fail LOUDLY
        # with a typed, actionable error instead of MLlib's opaque
        # "Nothing has been added to this summarizer" (an empty labeled
        # slice upstream is an orchestration bug the operator must name)
        raise EmptyTrainingSliceError(
            "train_quality_classifier: labeled_docs has no rows — cannot "
            "fit a classifier on an empty training slice"
        )
    tf = HashingTF(inputCol="__toks", outputCol="__feat", numFeatures=num_features)
    lr = LogisticRegression(
        featuresCol="__feat",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
    )
    return Pipeline(stages=[tf, lr]).fit(prepped)


def score_quality_classifier(
    model,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, clf_quality, predicted) — P(label=1) and the hard decision from
    a :func:`train_quality_classifier` model. Map-only at any scale."""
    from pyspark.ml.functions import vector_to_array

    from ..functions.text import tokenize

    out = model.transform(
        docs.withColumn(
            "__toks",
            F.coalesce(tokenize(F.col(text_col)), F.array().cast("array<string>")),
        )
    )
    return out.select(
        F.col(id_col),
        F.round(vector_to_array("probability")[1], 6).alias("clf_quality"),
        F.col("prediction").cast("int").alias("predicted"),
    )


def quality_calibration(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n_bins: int = 10
) -> DataFrame:
    """Calibration table of the cheap heuristic quality score
    (textstats.quality_score) against the Gopher rule verdict
    (curation.gopher_rules): fixed-width score bins × keep rate. The
    reliability diagram every quality-signal consumer should look at
    before thresholding — a well-calibrated score has keep_rate rising
    monotonically with the bin; flat regions are where the cheap score
    carries no signal and a model-based classifier
    (:func:`train_quality_classifier`) earns its cost.

    Output: (bin, n_docs, n_keep, keep_rate) with bin = min(⌊q·n_bins⌋,
    n_bins−1) — q is bit-identical in both engines, and multiply/floor of
    identical doubles is IEEE-exact, so binning is cross-engine stable;
    keep_rate is an unrounded int/int division.

    Scale: two map-only feature passes over the corpus (both pure column
    expressions), one doc-key equi-join, one ≤n_bins-group aggregate.
    """
    from . import curation as CU
    from . import textstats as TS

    q = TS.quality_score(docs, id_col, text_col).select(id_col, "quality")
    g = CU.gopher_rules(docs, id_col, text_col).select(id_col, "keep")
    binned = q.join(g, id_col).select(
        F.least(
            F.floor(F.col("quality") * F.lit(n_bins)).cast("long"),
            F.lit(n_bins - 1),
        ).alias("bin"),
        F.col("keep").cast("int").alias("__k"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("__k").alias("n_keep"),
        (F.sum("__k").cast("double") / F.count("*").cast("double")).alias(
            "keep_rate"
        ),
    )


def ccnet_perplexity_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_mod: int = 20,
) -> DataFrame:
    """(bucket, n_docs, n_bigrams, nll_q, mean_nll) — CCNet-style
    head/middle/tail partition of the corpus by LM fluency (Wenzek et al.
    2020: rank by perplexity, cut into terciles; head feeds training first).

    CCNet derives its cutoffs from a SAMPLE and applies them map-only —
    exactly what survives 100 TB (a global rank over the corpus would be a
    single-partition sort). Here the sample is the deterministic 1-in-
    ``sample_mod`` id slice; its tercile cutoffs (value at rank ⌈m/3⌉ and
    ⌈2m/3⌉ by (avg_nll, doc_id)) become two broadcast literals, and every
    doc buckets by comparison. ``avg_nll = nll_q_micro/(n_bigrams·1e6)`` is
    the UNROUNDED int→double reconstruction — identical doubles in both
    engines, so the cutoff comparisons and the bucket assignment are
    bit-deterministic. Attested values are the exact integer sums.

    Requires NUMERIC ids: the 1-in-``sample_mod`` slice is ``id %
    sample_mod``, which is NULL (row dropped) for non-castable ids. An
    EMPTY sample — non-numeric ids or a corpus with no id ≡ 0 (mod
    ``sample_mod``) — yields NULL cutoffs; rather than silently
    classifying everything 'tail', such rows land in an explicit
    ``unsampled`` bucket.
    """
    from pyspark.sql import Window

    scored = bigram_lm_score(docs, id_col, text_col).select(
        F.col(id_col).alias("doc_id"),
        "n_bigrams",
        "nll_q_micro",
        (F.col("nll_q_micro").cast("double") / (F.col("n_bigrams") * _Q)).alias(
            "avg_nll"
        ),
    )
    sample = scored.filter(F.col("doc_id") % sample_mod == 0)
    w = Window.orderBy("avg_nll", "doc_id")
    ranked = sample.select("avg_nll", F.row_number().over(w).alias("rn")).crossJoin(
        F.broadcast(sample.agg(F.count(F.lit(1)).alias("m")))
    )
    cuts = ranked.agg(
        F.max(
            F.when(F.col("rn") == F.expr("CAST((m + 2) DIV 3 AS INT)"), F.col("avg_nll"))
        ).alias("c1"),
        F.max(
            F.when(
                F.col("rn") == F.expr("CAST((2 * m + 2) DIV 3 AS INT)"), F.col("avg_nll")
            )
        ).alias("c2"),
    )
    # Empty sample (tiny corpus, or ids the numeric `% sample_mod` can't
    # see) => NULL cutoffs. Don't let every doc silently land in 'tail':
    # surface it as an explicit bucket so monitors fail loudly. The branch
    # never fires on a non-empty numeric-id sample (rank ceil(m/3) exists
    # for every m >= 1), so the oracle needs no twin.
    bucketed = scored.crossJoin(F.broadcast(cuts)).select(
        F.when(F.col("c1").isNull(), F.lit("unsampled"))
        .when(F.col("avg_nll") <= F.col("c1"), F.lit("head"))
        .when(F.col("avg_nll") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
        "n_bigrams",
        "nll_q_micro",
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bigrams").alias("n_bigrams"),
        F.sum("nll_q_micro").alias("nll_q"),
        (
            F.sum("nll_q_micro").cast("double") / (F.sum("n_bigrams") * F.lit(float(_Q)))
        ).alias("mean_nll"),
    )
