"""Stored-artifact consumption: joining a MATERIALIZED split manifest.

lifecycle.split_manifest_counts is self-contained — it derives the
group-aware manifest (corpus shingle→minhash pass + pair graph) and
consumes it in one lineage, which is right for a registry entry but not
the production call pattern: a training build writes the manifest ONCE
and joins it MANY times (split counts, packing, decontamination,
eval-set extraction all key on the same (doc_id, group_key, split)
table). This module carries the consumption half against a stored
manifest DataFrame, so the expensive derivation is provably absent from
the consuming plan (test-pinned: the executed plan scans exactly the
manifest + corpus files, zero re-derivation of the pair graph).

Separate module by design (staleness blast radius: lifecycle.py holds
three fresh attestations; see MEMORY / tools/blast_radius.py).

Scale shape: one map-side token count on the corpus scan + one id-keyed
join against the (corpus-sized but 3-column) manifest + a 3-key groupBy.
At 100 TB the manifest is the small side of nothing — it is corpus-row
count — but it is narrow (id, group, split), so the join is the cheapest
corpus-sized join the pipeline runs; bucketing both sides by doc_id
makes it shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_manifest_counts_stored(
    docs: DataFrame,
    manifest: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-split accounting (docs, distinct groups, exact token budget)
    computed from a STORED manifest — the lifecycle.split_manifest_counts
    relation without re-deriving the assignment. The manifest is the
    source of truth for membership: only rows present in it are counted
    (it was built over clean rows, so the hygiene is inherited)."""
    from ..functions.text import tokenize

    toks = docs.where(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(
        F.col(id_col), F.size(tokenize(F.col(text_col))).alias("__nt")
    )
    return (
        manifest.join(toks, id_col)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("group_key").cast("long").alias("n_groups"),
            F.sum("__nt").cast("long").alias("sum_tokens"),
        )
    )
