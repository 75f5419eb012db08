"""End-to-end LLM training-data curation over the test corpus.

The north-star extension flow (README "LLM-data-pipeline operators"): clean
→ dedup at three granularities → quality-filter → budget-sample, plus the
ingest-health monitors a production firehose runs continuously. Every step
is a distributed DataFrame plan (shuffle budgets documented in SCALE.md);
nothing here collects more than scalar/k-row summaries. Run:

    python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from auto_vectordb_spark.operators import analytics as AN
from auto_vectordb_spark.operators import dedup as DD
from auto_vectordb_spark.operators import textstats as TS
from auto_vectordb_spark.pipeline import build_training_set
from auto_vectordb_spark.plans.parity import load_views
from auto_vectordb_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="curation_pipeline", cpus=8)
    t = load_views(spark, sf_dir)
    docs, events = t["documents"], t["events"]

    # 1. PII scrub + cheap quality features (row-local, codegen)
    scrubbed = TS.scrub(docs).select("doc_id", "scrubbed")
    print(f"scrubbed: {scrubbed.count()} docs")

    # 2. Sentence-level boilerplate removal (cross-doc verbatim sentences).
    #    The synthetic corpus carries no punctuation, so counts here are 0
    #    on testdata — plans/parity.py's text_sentences entries derive
    #    punctuation deterministically to exercise the split; on real text
    #    this step is the boilerplate filter.
    seg = TS.sentence_segments(docs)
    boiler = DD.sentence_crossdoc_dups(seg)
    print(f"boilerplate sentences (>=2 docs): {boiler.count()}")
    cleaned = DD.remove_dup_sentences(seg)
    removed = cleaned.filter("n_removed > 0").count()
    print(f"docs with sentences removed: {removed}")

    # 3. Near-dup document removal + quality gate + token-budget sample —
    #    the flagship one-lineage flow (MinHash-LSH -> components ->
    #    keep-one -> quality >= 0.5 -> deterministic budget prefix)
    sample = build_training_set(docs, quality_min=0.5, token_budget=50_000)
    n = sample.count()
    toks = sample.agg({"n_tokens": "sum"}).collect()[0][0]
    print(f"training sample: {n} docs, {toks} tokens (budget 50k)")

    # 3b. Wave-2 curation: CCNet fluency terciles, incremental-crawl
    #     novelty, subset-containment dedup, and sequence-packing accounting
    from pyspark.sql import functions as F

    from auto_vectordb_spark.operators import curation as CU
    from auto_vectordb_spark.operators import quality as QL

    for r in sorted(
        QL.ccnet_perplexity_buckets(docs).collect(), key=lambda r: r["bucket"]
    ):
        print(
            f"ccnet {r['bucket']:6s}: {r['n_docs']} docs, "
            f"mean_nll={r['mean_nll']:.3f}"
        )
    new = docs.filter(F.col("doc_id") % 5 == 0)
    ref = docs.filter(F.col("doc_id") % 5 != 0)
    fresh = DD.ngram_novelty(new, ref).filter("novelty >= 0.5").count()
    print(f"high-novelty docs in the incoming batch: {fresh}")
    subset_dups = DD.ngram_containment_pairs(docs, threshold=0.9).count()
    print(f"subset-duplication pairs (containment >= 0.9): {subset_dups}")
    packs = CU.pack_sequences(docs, ctx_len=512)
    waste = packs.filter("fill < 0.5").count()
    print(f"packs: {packs.count()} at ctx=512, under-half-full tails: {waste}")

    # 4. Ingest-health monitors on the event firehose (operators/analytics.py)
    for name, df in (
        ("z-score", AN.volume_anomaly_zscore(events)),
        ("median/MAD", AN.volume_anomaly_mad(events)),
    ):
        k = df.filter("is_anomaly").count()
        print(f"{name} anomalies: {k} hourly cells")
    worst = (
        AN.seasonal_deviation(events)
        .orderBy("deviation", ascending=False)
        .limit(3)
        .collect()
    )
    for r in worst:
        print(
            f"seasonal outlier: {r['event_type']} {r['hour']} "
            f"n={r['n_events']} expected={r['expected']}"
        )

    # 5. Round-9 additions: information density, physical layout planning,
    #    and the training schedule (operators/{infodensity,layout,schedule})
    from auto_vectordb_spark.operators import infodensity as ID
    from auto_vectordb_spark.operators import layout as L
    from auto_vectordb_spark.operators import schedule as SCH

    for r in sorted(
        ID.compression_density_by_source(docs).collect(), key=lambda r: r["source"]
    ):
        mean_ratio = r["sum_ratio_6d"] / r["n_docs"] / 1e6
        print(
            f"density {r['source']:10s}: {r['n_docs']} docs, "
            f"mean DEFLATE ratio {mean_ratio:.3f}, "
            f"{r['n_high_redundancy']} boilerplate-suspect"
        )
    gain = L.zorder_pruning_gain(events).first()
    print(
        f"layout: z-order opens {gain['z_key_probe']}/{gain['files_total']} files "
        f"for a key probe and {gain['z_time_probe']} for a time probe "
        f"(vs {gain['keysort_time_probe']} under a key-sorted layout)"
    )
    rewrites = L.zorder_compaction_plan(events).filter("action = 'rewrite'").count()
    print(f"layout: incremental OPTIMIZE would rewrite {rewrites} buckets")
    scored = TS.quality_score(docs).join(docs.select("doc_id", "lang"), "doc_id")
    stages = sorted(
        SCH.curriculum_stages(scored).collect(), key=lambda r: -r["stage"]
    )
    for i, r in enumerate(stages[:3]):
        tag = " (consumed first)" if i == 0 else ""
        print(
            f"curriculum stage {r['stage']}{tag}: {r['n_docs']} docs, "
            f"quality [{r['q_lo']:.3f}, {r['q_hi']:.3f}], "
            f"{r['sum_tokens']} tokens, {r['n_langs']} langs"
        )

    # 6. Round-10 additions: the whole chain above as ONE attested lineage,
    #    the z-order layout actually written and probed, and a new
    #    benchmark decontaminated against the persisted corpus index
    import tempfile

    from auto_vectordb_spark.operators import snapshots as SN

    for r in sorted(
        SN.curriculum_pack_manifest(docs).collect(), key=lambda r: -r["stage"]
    ):
        print(
            f"manifest stage {r['stage']}: {r['n_docs']} docs -> "
            f"{r['n_packs']} packs of ~512 tokens ({r['sum_tokens']} total), "
            f"quality [{r['q_lo']:.3f}, {r['q_hi']:.3f}]"
        )
    zdir = tempfile.mkdtemp(prefix="example_ztable_")
    L.zorder_write(events, zdir)
    pr = L.zorder_probe_scan(spark, zdir).first()
    print(
        f"materialized z-order: rectangle probe opened {pr['files_scanned']}"
        f"/{pr['files_total']} files for {pr['n_rows']} rows"
    )
    idx = SN.shingle_index(docs.filter(F.col("doc_id") >= 6))
    idir = tempfile.mkdtemp(prefix="example_shidx_")
    idx.write.mode("overwrite").parquet(idir)
    stored = spark.read.schema(idx.schema).parquet(idir)
    new_bench = docs.filter((F.col("doc_id") >= 3) & (F.col("doc_id") < 6))
    n_flagged = SN.decontaminate_probe(stored, new_bench).count()
    print(f"new benchmark vs persisted index: {n_flagged} corpus docs flagged")

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
