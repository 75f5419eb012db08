"""Information density via compression ratio — the classic corpus-quality
signal the heuristic ratios cannot see.

``deflate(text) / len(text)`` is the cheap, model-free proxy for
information density used by large-scale curation pipelines: templated
spam, keyword stuffing, and machine-generated boilerplate compress far
below natural prose, while already-compressed or encrypted junk sits near
1.0. It complements the registry's other quality tiers (heuristic ratios,
bigram-LM NLL, CCNet buckets, token entropy): entropy sees only the
unigram distribution, while DEFLATE's LZ77 window catches REPEATED
STRUCTURE across the whole document.

Engine shape: zlib is CPython stdlib (always present, deterministic for a
pinned level — no env-blocked seam), so the kernel is a real Arrow-batched
``mapInPandas`` over the text column. The kernel returns ONLY int64 sizes
(raw bytes, compressed bytes) — the pure-int kernel doctrine — and the
ratio/rounding/aggregation happen JVM-side in exact column arithmetic, so
a cross-engine or cross-version float discrepancy has nowhere to hide.
NULL ids/texts fail the row, not the job (cleanvec doctrine); non-UTF-8
surrogates byte-encode via 'replace' so one malformed string cannot kill
a partition task.

No DuckDB oracle exists (no SQL zlib), so the registry entry is
rows-only; tests/test_infodensity.py pins the kernel bit-exactly against
a pure-Python zlib reference over the same fixture rows instead.

Reference scope note: the reference system (kstyle2198/auto_vectordb)
has no corpus-quality surface — this module is part of the
training-data-pipeline extension mandate (SURVEY.md step 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Pinned DEFLATE level: determinism of the signal is part of its contract
#: (re-scoring an unchanged corpus must be a no-op diff).
ZLIB_LEVEL = 6

_SIZES_SCHEMA = "doc_id long, source string, n_bytes long, z_bytes long"


def _sizes_kernel(batches):
    import zlib

    import pandas as pd

    for pdf in batches:
        # NULL ids/texts are filtered JVM-side before the kernel (an
        # int64 Arrow batch containing any NULL materializes in pandas
        # as float64, which would corrupt ids above 2^53 BEFORE any
        # kernel-side recovery could run); the notna re-check here is a
        # contract assertion, not the filter.
        ok = pd.notna(pdf["doc_id"]) & pd.notna(pdf["text"])
        if not ok.any():
            continue
        sub = pdf[ok]
        raw = [t.encode("utf-8", errors="replace") for t in sub["text"]]
        yield pd.DataFrame(
            {
                "doc_id": sub["doc_id"].astype("int64"),
                "source": sub["source"],
                "n_bytes": pd.Series([len(b) for b in raw], index=sub.index, dtype="int64"),
                "z_bytes": pd.Series(
                    [len(zlib.compress(b, ZLIB_LEVEL)) for b in raw],
                    index=sub.index,
                    dtype="int64",
                ),
            }
        )


def compression_sizes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, source, n_bytes, z_bytes) — raw and DEFLATE-compressed
    byte sizes per document. Map-only Arrow batches; the corpus is never
    shuffled and nothing but int64 sizes leaves the kernel. NULL ids and
    texts fail the row HERE, JVM-side: a NULL reaching the kernel would
    force the whole Arrow batch's id column through float64 and silently
    corrupt every id above 2^53 in that batch."""
    src = docs.where(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(
        F.col(id_col).alias("doc_id"),
        F.col("source"),
        F.col(text_col).alias("text"),
    )
    return src.mapInPandas(_sizes_kernel, schema=_SIZES_SCHEMA)


def compression_density_by_source(
    docs: DataFrame, redundancy_max: float = 0.45
) -> DataFrame:
    """Per-source information-density report: document count, exact
    1e-6-quantized ratio mass (parity rule 1 — mean = sum/n downstream),
    the rounded ratio extremes, and how many documents compress below
    ``redundancy_max`` (the templated/boilerplate flag a curation funnel
    consumes). One short-key shuffle on source; ratio math is exact JVM
    column arithmetic over the kernel's int64 sizes."""
    sizes = compression_sizes(docs)
    ratio = F.round(
        F.col("z_bytes").cast("double") / F.nullif(F.col("n_bytes"), F.lit(0)), 6
    )
    scored = sizes.select(
        "source",
        ratio.alias("ratio"),
        F.round(ratio * 1_000_000, 0).cast("long").alias("r6"),
    ).where(F.col("ratio").isNotNull())  # an empty doc has no density
    return scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("r6").alias("sum_ratio_6d"),
        F.min("ratio").alias("ratio_lo"),
        F.max("ratio").alias("ratio_hi"),
        F.count(F.when(F.col("ratio") <= redundancy_max, 1)).alias(
            "n_high_redundancy"
        ),
    )
