"""operators/snapshots.py — cross-snapshot lifecycle operators.

snapshot_diff and split_leakage_audit are checked against independent
Python recomputations of their definitions; the persisted-index probe is
checked for storage-roundtrip EQUIVALENCE to the from-scratch
decontaminate run; the curriculum-pack manifest's chain accounting is
reconciled step by step against the individually-verified kernels.
"""

import pytest
from pyspark.sql import functions as F

from auto_vectordb_spark.operators import snapshots as SN
from auto_vectordb_spark.plans.parity import load_views


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    return load_views(spark, sf_dir)


def test_snapshot_diff_statuses_exact(spark):
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (None, "ghost"), (9, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(2, "beta"), (3, "gamma CHANGED"), (4, "delta")],
        "doc_id long, text string",
    )
    got = {r.status: r.n_docs for r in SN.snapshot_diff(old, new).collect()}
    # 1 removed (id 1), 1 unchanged (id 2), 1 changed (id 3), 1 added
    # (id 4); NULL id/text rows fail the row on either side
    assert got == {"removed": 1, "unchanged": 1, "changed": 1, "added": 1}
    # identical snapshots: everything unchanged
    same = {r.status: r.n_docs for r in SN.snapshot_diff(new, new).collect()}
    assert same == {"unchanged": 3}
    # empty old: everything added
    empty = spark.createDataFrame([], "doc_id long, text string")
    allnew = {r.status: r.n_docs for r in SN.snapshot_diff(empty, new).collect()}
    assert allnew == {"added": 3}
    assert SN.snapshot_diff(empty, empty).count() == 0


def test_decontaminate_probe_persisted_index_equals_from_scratch(spark, tmp_path):
    """Cross-snapshot incremental decontamination: probing a NEW benchmark
    against the parquet-persisted corpus shingle index must equal the
    from-scratch decontaminate_flags run on the same slices — persistence
    is a storage round-trip, never a semantic change."""
    from auto_vectordb_spark.operators.dedup import decontaminate_flags

    corpus = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "completely unrelated text about spark shuffles"),
            (12, "benchmarks often reuse the quick brown fox sentence"),
        ],
        "doc_id long, text string",
    )
    new_bench = spark.createDataFrame(
        [(0, "we evaluate on the quick brown fox sentences")],
        "doc_id long, text string",
    )
    idx = SN.shingle_index(corpus)
    path = str(tmp_path / "shingle_index")
    idx.write.parquet(path)
    stored = spark.read.schema(idx.schema).parquet(path)
    got = {
        r["doc_id"]: r["n_shared"]
        for r in SN.decontaminate_probe(stored, new_bench).collect()
    }
    want = {
        r["doc_id"]: r["n_shared"]
        for r in decontaminate_flags(corpus, new_bench).collect()
    }
    assert got == want == {10: 2, 12: 2}
    # empty benchmark probes cleanly (no flags, not a crash)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert SN.decontaminate_probe(stored, empty).count() == 0


def test_split_leakage_audit_counts_cross_split_pairs(spark):
    """The audit must reproduce: (pairs from the verified LSH graph)
    grouped by the unordered split pair of their endpoints — checked
    against independently relabeling the pair list in Python."""
    from auto_vectordb_spark.functions.hashing import stable_hash60
    from auto_vectordb_spark.operators.dedup import minhash_lsh_pairs

    base = (
        "the quick brown fox jumps over the lazy dog near the river bank today"
    )
    rows = [(i, base + (f" tail{i}" if i % 3 == 0 else "")) for i in range(1, 40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs).collect()}
    assert pairs, "fixture must produce near-dup candidates"
    ranks = {
        r.doc_id: r.rk
        for r in docs.select(
            "doc_id",
            F.when(stable_hash60(F.col("doc_id").cast("string")) % 100 < 90, 0)
            .when(stable_hash60(F.col("doc_id").cast("string")) % 100 < 95, 1)
            .otherwise(2)
            .alias("rk"),
        ).collect()
    }
    names = {0: "train", 1: "val", 2: "test"}
    want: dict[tuple, int] = {}
    for a, b in pairs:
        lo, hi = sorted((ranks[a], ranks[b]))
        key = (names[lo], names[hi])
        want[key] = want.get(key, 0) + 1
    got = {
        (r.split_lo, r.split_hi): r.n_pairs
        for r in SN.split_leakage_audit(docs).collect()
    }
    assert got == want
    # empty corpus audits cleanly
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert SN.split_leakage_audit(empty).count() == 0


def test_curriculum_pack_manifest_chain_accounting(spark, tables):
    """The one-lineage manifest must account exactly: stage depths differ
    by at most one over the deduped+quality-gated survivor count, token
    sums reconcile, packs cover every doc, and stage quality ranges are
    monotone (it IS a curriculum)."""
    from auto_vectordb_spark.operators.textstats import quality_score

    docs = tables["documents"]
    rep = SN.curriculum_pack_manifest(docs).collect()
    # survivors recomputed independently: keep-one over md5, quality >= .5
    base = docs.where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    uniq = base.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
    kept = quality_score(base.join(uniq, "doc_id")).where(
        F.col("quality") >= 0.5
    )
    n, toks = kept.count(), kept.agg(F.sum("n_tokens")).first()[0]
    assert sum(r.n_docs for r in rep) == n
    assert sum(r.sum_tokens for r in rep) == toks
    counts = [r.n_docs for r in rep]
    assert max(counts) - min(counts) <= 1
    by_stage = sorted(rep, key=lambda r: r.stage)
    for a, b in zip(by_stage, by_stage[1:]):
        assert a.q_hi <= b.q_lo  # difficulty monotone across stages
    for r in rep:
        # packing sanity: can't have more packs than docs, and the pack
        # count must cover the stage's token mass at ctx=512
        assert 1 <= r.n_packs <= r.n_docs
        assert r.n_packs >= r.sum_tokens // 512 - r.n_docs


def test_curriculum_pack_manifest_empty_and_dirty(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert SN.curriculum_pack_manifest(empty).count() == 0
    dirty = spark.createDataFrame(
        [(None, "some text here"), (1, None), (2, "real document " * 30)],
        "doc_id long, text string",
    )
    rep = SN.curriculum_pack_manifest(dirty).collect()
    assert sum(r.n_docs for r in rep) == 1  # only the clean row survives


def test_group_aware_splits_have_zero_leakage(spark):
    """Keyed on the component id, every near-dup family lands in one
    split: the relation must be all-diagonal, and its pair total must
    equal the id-keyed audit's (same pair graph, different key)."""
    base = (
        "the quick brown fox jumps over the lazy dog near the river bank today"
    )
    rows = [(i, base + (f" tail{i}" if i % 3 == 0 else "")) for i in range(1, 40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    grouped = SN.split_leakage_groupaware(docs).collect()
    assert grouped, "fixture must produce near-dup candidates"
    assert all(r.split_lo == r.split_hi for r in grouped)
    audit_total = sum(
        r.n_pairs for r in SN.split_leakage_audit(docs).collect()
    )
    assert sum(r.n_pairs for r in grouped) == audit_total
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert SN.split_leakage_groupaware(empty).count() == 0


def test_group_aware_split_pays_one_corpus_pass(spark, tables):
    """r10 verdict #2/#4: the pair graph has TWO consumers
    (connected_components and the endpoint relabel joins) and used to be
    derived twice — the full corpus shingle→minhash pipeline re-ran for
    the relabel. The fix eagerly localCheckpoints the pair graph, so the
    returned relation's executed plan reads the materialized RDD and
    contains ZERO scans of the corpus parquet: the one corpus pass
    happened at checkpoint time, before fan-out."""
    df = SN.split_leakage_groupaware(tables["documents"])
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Scan parquet" not in plan, (
        "relabel side re-derives the corpus pipeline — pair-graph "
        "checkpoint lost"
    )
