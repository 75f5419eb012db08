"""operators/lifecycle.py — cross-snapshot dedup state and the
consumable group-aware split manifest.

The incremental dedup is attested for storage-roundtrip + incremental
EQUIVALENCE: surviving ids must equal a from-scratch apply_dedup of the
union, with the old snapshot's bucket table and pair graph read back
from parquet. The manifest is attested for the property it exists to
provide: relabeling the pair graph through it is all-diagonal (zero
cross-split leakage), singletons fall back to the id-keyed split, and
every clean doc is assigned exactly once.
"""

import pytest
from pyspark.sql import functions as F

from auto_vectordb_spark.functions.hashing import stable_hash60
from auto_vectordb_spark.operators import lifecycle as LC
from auto_vectordb_spark.operators.dedup import (
    apply_dedup,
    minhash_bucket_table,
    minhash_lsh_pairs,
)
from auto_vectordb_spark.plans.parity import load_views

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_views(spark, SF)["documents"]


def test_incremental_dedup_equals_from_scratch(spark, docs, tmp_path):
    """Survivors of (old artifacts + new batch) must equal a from-scratch
    apply_dedup over the union — persistence and incrementality are
    storage/plumbing, never a semantic change."""
    split = 400
    old = docs.where(F.col("doc_id") < split)
    new = docs.where(F.col("doc_id") >= split)

    buckets = minhash_bucket_table(old)
    pairs = minhash_lsh_pairs(old).select("id_a", "id_b")
    bpath, ppath = str(tmp_path / "buckets"), str(tmp_path / "pairs")
    buckets.write.parquet(bpath)
    pairs.write.parquet(ppath)
    stored_b = spark.read.schema(buckets.schema).parquet(bpath)
    stored_p = spark.read.schema(pairs.schema).parquet(ppath)

    got = {
        r.doc_id
        for r in LC.snapshot_dedup_incremental(old, new, stored_b, stored_p)
        .select("doc_id")
        .collect()
    }
    want = {
        r.doc_id
        for r in apply_dedup(docs, minhash_lsh_pairs(docs)).select("doc_id").collect()
    }
    assert got == want
    assert len(got) < docs.count()  # the fixture really has near-dups


def test_incremental_dedup_empty_batch(spark, docs, tmp_path):
    """An empty new batch must leave the old snapshot's survivor set
    exactly as the old pair graph implies."""
    old = docs.where(F.col("doc_id") < 400)
    empty = spark.createDataFrame([], docs.schema)
    buckets = minhash_bucket_table(old)
    pairs = minhash_lsh_pairs(old).select("id_a", "id_b")
    got = {
        r.doc_id
        for r in LC.snapshot_dedup_incremental(old, empty, buckets, pairs)
        .select("doc_id")
        .collect()
    }
    want = {
        r.doc_id
        for r in apply_dedup(old, minhash_lsh_pairs(old)).select("doc_id").collect()
    }
    assert got == want


def test_manifest_assigns_every_clean_doc_once(spark, docs):
    m = LC.split_assignment_manifest(docs)
    rows = m.collect()
    clean = docs.where(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    ).count()
    assert len(rows) == clean
    assert len({r.doc_id for r in rows}) == clean
    assert {r.split for r in rows} <= {"train", "val", "test"}


def test_manifest_groups_share_split_and_singletons_use_id(spark, docs):
    """Docs in one near-dup component share group_key and split; docs in
    no pair fall back to group_key == own id, whose split equals the
    registry's id-keyed 90/5/5 assignment."""
    m = {r.doc_id: r for r in LC.split_assignment_manifest(docs).collect()}
    pairs = minhash_lsh_pairs(docs).collect()
    paired = set()
    for p in pairs:
        paired |= {p.id_a, p.id_b}
        assert m[p.id_a].group_key == m[p.id_b].group_key
        assert m[p.id_a].split == m[p.id_b].split
    singles = [d for d in m if d not in paired]
    assert singles
    names = {0: "train", 1: "val", 2: "test"}
    sample = spark.createDataFrame(
        [(d,) for d in singles], "doc_id long"
    ).select(
        "doc_id",
        (
            F.when(stable_hash60(F.col("doc_id").cast("string")) % 100 < 90, 0)
            .when(stable_hash60(F.col("doc_id").cast("string")) % 100 < 95, 1)
            .otherwise(2)
        ).alias("rk"),
    )
    for r in sample.collect():
        assert m[r.doc_id].group_key == r.doc_id
        assert m[r.doc_id].split == names[r.rk]


def test_manifest_audit_is_all_diagonal(spark, docs):
    """Relabeling the pair graph through the manifest must show zero
    cross-split pairs — the property split_leakage_groupaware audits,
    now verified against the CONSUMABLE table."""
    m = LC.split_assignment_manifest(docs)
    pairs = minhash_lsh_pairs(docs)
    a = m.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
    b = m.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
    crossing = pairs.join(a, "id_a").join(b, "id_b").where(
        F.col("sa") != F.col("sb")
    )
    assert crossing.count() == 0


def test_manifest_counts_reconcile(spark, docs):
    """Per-split accounting must cover every clean doc once, its token
    sum must equal the corpus total, and group counts must partition the
    distinct group keys (groups never straddle splits)."""
    from auto_vectordb_spark.functions.text import tokenize

    rows = LC.split_manifest_counts(docs).collect()
    clean = docs.where(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    assert sum(r.n_docs for r in rows) == clean.count()
    total_tokens = clean.select(
        F.sum(F.size(tokenize(F.col("text"))))
    ).first()[0]
    assert sum(r.sum_tokens for r in rows) == total_tokens
    n_groups = (
        LC.split_assignment_manifest(docs)
        .select("group_key")
        .distinct()
        .count()
    )
    assert sum(r.n_groups for r in rows) == n_groups
    # the split is still roughly 90/5/5 by docs (group lumpiness allowed)
    by = {r.split: r.n_docs for r in rows}
    assert by["train"] > by.get("val", 0) and by["train"] > by.get("test", 0)


def test_manifest_empty_and_dirty(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert LC.split_assignment_manifest(empty).count() == 0
    dirty = spark.createDataFrame(
        [(None, "ghost text"), (1, None), (2, "real document text here")],
        "doc_id long, text string",
    )
    rows = LC.split_assignment_manifest(dirty).collect()
    assert [r.doc_id for r in rows] == [2]
