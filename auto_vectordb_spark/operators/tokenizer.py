"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the tokenizer-
TRAINING capability of an LLM data pipeline (the reference has no tokenizer
surface at all; textstats.py only counts tokens with a fixed BPE-ish regex).

Scale shape — the whole algorithm runs on the WORD-COUNT table, never the
corpus:

1. ONE corpus pass reduces text to (word, count) — the standard BPE
   pre-tokenization reduction. At 100 TB the distinct-word table is a few
   hundred million rows at most: it fits the cluster trivially and every
   merge iteration operates on it alone.
2. Each of the K merge iterations is: adjacent-pair counts (one short-key
   shuffle over the vocab, map-side combined, weighted by word count) →
   argmax collect of ONE row (count desc, pair asc — deterministic
   tie-break) → apply the merge to the symbol strings with a
   lookaround-anchored regexp_replace (the exact left-to-right
   non-overlapping semantics of the reference implementation's
   ``re.sub('(?<!\\S)a b(?!\\S)')``).
3. The evolving vocab is eagerly ``localCheckpoint``-ed per iteration:
   that truncates the LOGICAL plan, not just execution — K nested merge
   rounds otherwise accrete a plan whose very explain-string OOMs the
   driver (measured at K=20 on a default-heap session), the same reason
   dedup's label propagation checkpoints. Each round's jobs then run
   against a one-round-deep plan over the small vocab blocks.

The 1-row-per-iteration collect is a sanctioned scalar action (the global
argmax is a reduction to ONE value by definition); nothing else leaves the
executors. Equivalence against a pure-Python reference BPE is gated in
tests/test_tokenizer.py.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize

END_OF_WORD = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) — the one corpus-scale reduction of BPE training."""
    return (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def _initial_symbols() -> F.Column:
    """Space-joined character symbols with the end-of-word marker:
    'low' → 'l o w </w>'."""
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    return F.array_join(F.concat(chars, F.array(F.lit(END_OF_WORD))), " ")


_PAIRS_EXPR = (
    "transform(slice(__s, 1, size(__s) - 1), (x, i) -> "
    "struct(x AS left, element_at(__s, i + 2) AS right))"
)


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(left, right, freq): adjacent symbol pairs weighted by word count."""
    return (
        vocab.select(F.split("sym", " ").alias("__s"), "count")
        .select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"), "count")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("count").alias("freq"))
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 30,
    min_freq: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Learn ``num_merges`` BPE merges from a corpus.

    Returns ``(merges, vocab)``:

    - ``merges``: (rank, left, right, freq) — the ordered merge table, i.e.
      THE tokenizer artifact (apply with :func:`bpe_encode_words`);
    - ``vocab``: (word, sym, count) — every distinct word with its final
      subword segmentation (space-joined), for fertility/coverage audits.

    Stops early when the best pair's frequency drops below ``min_freq``
    (merging singletons memorizes the corpus).
    """
    spark = docs.sparkSession
    vocab = (
        word_counts(docs, text_col)
        .select("word", _initial_symbols().alias("sym"), "count")
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("freq").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["freq"] < min_freq:
            break
        left, right, freq = best[0]["left"], best[0]["right"], int(best[0]["freq"])
        merges.append((rank, left, right, freq))
        pattern = f"(?<!\\S){re.escape(left)} {re.escape(right)}(?!\\S)"
        vocab = vocab.withColumn(
            "sym",
            F.regexp_replace(
                "sym", pattern, (left + right).replace("\\", "\\\\").replace("$", "\\$")
            ),
        ).localCheckpoint()
    merges_df = spark.createDataFrame(
        merges, "rank int, left string, right string, freq bigint"
    )
    return merges_df, vocab


def bpe_encode_words(words: DataFrame, merges: DataFrame) -> DataFrame:
    """Segment each distinct word with a learned merge table. ``words``:
    any DataFrame with a ``word`` column; returns (word, sym, n_subwords)
    with ``sym`` space-joined like the training vocab.

    Encoding a CORPUS reduces to encoding its distinct words then joining
    back — the same vocab-table trick as training, so encoding cost is
    proportional to the vocabulary, not the text. The merge table is
    collected and broadcast: it is ≤ vocab_size rows (tens of thousands)
    by construction — a bounded model artifact, not data. Per-word replay
    runs inside an Arrow-batched pandas_udf (the classic lowest-rank-first
    merge loop, provably equivalent to replaying merges in rank order), so
    a 30k-merge production tokenizer costs one dict lookup per pair instead
    of a 30k-deep regexp expression chain.
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {
        (r["left"], r["right"]): r["rank"]
        for r in merges.select("rank", "left", "right").collect()
    }
    bc = words.sparkSession.sparkContext.broadcast(ranks)

    @pandas_udf("string")
    def _encode(col):
        rk = bc.value

        def enc(word: str) -> str:
            syms = list(word) + [END_OF_WORD]
            while len(syms) > 1:
                pairs = [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]
                best = min(
                    (p for p in pairs if p in rk), key=rk.__getitem__, default=None
                )
                if best is None:
                    break
                out, i = [], 0
                while i < len(syms):
                    if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                        out.append(syms[i] + syms[i + 1])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return " ".join(syms)

        return col.map(enc)

    return (
        words.select("word")
        .distinct()
        .select("word", _encode(F.col("word")).alias("sym"))
        .select("word", "sym", F.size(F.split("sym", " ")).alias("n_subwords"))
    )
