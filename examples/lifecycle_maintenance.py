"""One ingest cycle of a maintained corpus — the round-11 decide→act
surface as a single walkthrough.

A production corpus is maintained, not rebuilt: each arriving batch must
be deduped against PERSISTED artifacts, absorbed into PERSISTED aggregate
state, and compacted into the PERSISTED physical layout — all without
re-reading history. Every step below is the oracle-attested operator the
registry carries (entry names in comments); nothing here collects more
than scalar/k-row summaries. Run:

    python examples/lifecycle_maintenance.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from auto_vectordb_spark.operators import dedup as DD
from auto_vectordb_spark.operators import incremental as IC
from auto_vectordb_spark.operators import layout_maint as LM
from auto_vectordb_spark.operators import lifecycle as LC
from auto_vectordb_spark.plans.parity import load_views
from auto_vectordb_spark.session import get_spark

CUTOFF = "2024-01-16 00:00:00"
DOC_SPLIT = 400  # doc_id >= DOC_SPLIT = the newly arrived snapshot


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="lifecycle_maintenance", cpus=8)
    t = load_views(spark, sf_dir)
    docs, events = t["documents"], t["events"]

    # ---- 1. The previous snapshot persisted its dedup artifacts ---------
    old = docs.filter(F.col("doc_id") < DOC_SPLIT)
    new = docs.filter(F.col("doc_id") >= DOC_SPLIT)
    bpath = tempfile.mkdtemp(prefix="lm_buckets_")
    ppath = tempfile.mkdtemp(prefix="lm_pairs_")
    buckets = DD.minhash_bucket_table(old)
    pairs = DD.minhash_lsh_pairs(old).select("id_a", "id_b")
    buckets.write.mode("overwrite").parquet(bpath)
    pairs.write.mode("overwrite").parquet(ppath)

    # ---- 2. New snapshot arrives: dedup WITHOUT re-reading the corpus ---
    # (registry entry: dedup_snapshot_incremental)
    stored_b = spark.read.schema(buckets.schema).parquet(bpath)
    stored_p = spark.read.schema(pairs.schema).parquet(ppath)
    survivors = LC.snapshot_dedup_incremental(old, new, stored_b, stored_p)
    print(f"survivors after incremental dedup: {survivors.count()}")

    # ---- 3. Group-aware splits the training build can consume ----------
    # (registry entries: split_assignment, split_manifest_counts)
    for r in LC.split_manifest_counts(docs).orderBy("split").collect():
        print(
            f"  split={r.split}: {r.n_docs} docs / {r.n_groups} groups / "
            f"{r.sum_tokens} tokens"
        )

    # ---- 4. Aggregate state absorbs the batch, never re-reads history --
    # (registry entries: rollup_incremental, sessionize_incremental,
    #  scd2_incremental)
    cut = F.lit(CUTOFF).cast("timestamp")
    ev_old = events.where(F.col("ts") < cut)
    ev_new = events.where(F.coalesce(F.col("ts") >= cut, F.lit(True)))
    rollup = IC.rollup_finalize(
        IC.rollup_merge(IC.hourly_rollup(ev_old), ev_new)
    )
    print(f"hourly rollup rows after merge: {rollup.count()}")
    sessions = IC.session_merge(
        IC.session_state(ev_old), IC.session_state(ev_new)
    )
    print(f"users with merged session state: {sessions.count()}")
    scd2 = IC.scd2_finalize(
        IC.scd2_merge(IC.scd2_state(ev_old), IC.scd2_state(ev_new))
    )
    cur = scd2.where(F.col("valid_to_s").isNull()).count()
    print(f"SCD-2 rows after CDC merge: {scd2.count()} ({cur} current)")

    # ---- 5. Physical layout: plan, APPLY, and probe the compacted table -
    # (registry entries: zorder_compaction_apply, zorder_compacted_probe)
    main_p = tempfile.mkdtemp(prefix="lm_zmain_")
    side_p = tempfile.mkdtemp(prefix="lm_zside_")
    plan = LM.zorder_compaction_apply(spark, events, main_p, side_p)
    acts = {r.action: r.cnt for r in plan.groupBy("action").agg(F.count("*").alias("cnt")).collect()}
    print(f"compaction plan applied: {acts}")
    probe = LM.zorder_compacted_probe(spark, main_p, side_p).first()
    print(
        f"rectangle probe over compacted table: {probe.n_rows} rows, "
        f"{probe.files_scanned}/{probe.files_total} files opened"
    )

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
