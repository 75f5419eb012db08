"""One GDPR erasure cycle across every persisted artifact — the round-12
delete surface as a single walkthrough.

A production pipeline receives removals, not just arrivals: an erasure
request (or a late correction) must be absorbed into every derived table
and index WITHOUT the from-scratch recompute. Each step below is the
oracle-attested operator the registry carries (entry names in comments);
nothing here collects more than scalar/k-row summaries. Run:

    python examples/erasure_lifecycle.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from auto_vectordb_spark.operators import dedup as DD
from auto_vectordb_spark.operators import incremental as IC
from auto_vectordb_spark.operators import knn as KNN
from auto_vectordb_spark.operators import retraction as RT
from auto_vectordb_spark.plans.parity import load_views
from auto_vectordb_spark.session import get_spark
from auto_vectordb_spark.streaming import cdc as CDC

CUTOFF = "2024-01-16 00:00:00"


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="erasure_lifecycle", cpus=8)
    t = load_views(spark, sf_dir)
    docs, events, emb = t["documents"], t["events"], t["embeddings"]

    # The erasure request: every event of these users, these documents,
    # and these vectors must go.
    del_events = events.where(F.pmod(F.col("user_id"), F.lit(37)) == 0)
    del_docs = docs.where(F.pmod(F.col("doc_id"), F.lit(23)) == 0).select("doc_id")
    del_vecs = emb.where(F.pmod(F.col("vec_id"), F.lit(13)) == 0).select("vec_id")

    # ---- 1. Additive state: negated partials (rollup_incremental_retract)
    state = RT.rollup_state_r(events)
    after = RT.rollup_retract(state, del_events)
    print(f"rollup groups: {state.count()} -> {after.count()} after erasure")

    # ---- 2. Non-invertible state: affected-only rebuilds ----------------
    # (scd2_incremental_retract, sessionize_incremental_retract)
    del_keys = del_events.select("user_id", "event_id")
    scd2 = IC.scd2_finalize(
        RT.scd2_retract(IC.scd2_state(events), events, del_keys)
    )
    sess = RT.session_retract(IC.session_state(events), events, del_keys)
    print(
        f"SCD-2 rows after erasure: {scd2.count()}; "
        f"users with session state: {sess.count()}"
    )

    # ---- 3. The dedup index absorbs the delete list (dedup_index_retract)
    buckets = DD.minhash_bucket_table(docs)
    pairs = DD.minhash_lsh_pairs(docs).select("id_a", "id_b")
    survivors, upd_b, upd_p = RT.dedup_index_retract(docs, buckets, pairs, del_docs)
    print(
        f"dedup survivors: {survivors.count()} docs; pair graph "
        f"{pairs.count()} -> {upd_p.count()} edges"
    )

    # ---- 4. BM25 index: LSM tombstones (bm25_delete_search) -------------
    idx = tempfile.mkdtemp(prefix="ex_bm25_")
    RT.bm25_index_append(docs, idx, epoch=0)
    RT.bm25_delete_docs(spark, idx, del_docs, epoch=1)
    live = RT.bm25_index_with_deletes(spark, idx)
    print(f"BM25 live docs after tombstones: {live.n_docs}")

    # ---- 5. IVF vector index: tombstone + reclaim (knn_ivf_delete_search)
    centroids = KNN.label_centroids(emb)
    ivf_path = tempfile.mkdtemp(prefix="ex_ivf_") + "/idx"
    KNN.ivf_write(KNN.ivf_build(emb, centroids), ivf_path)
    RT.ivf_delete_vectors(spark, ivf_path, del_vecs)
    counts = RT.ivf_reclaim_deleted(spark, ivf_path)
    print(
        f"IVF reclaim: {counts['rows_before']} -> {counts['rows_after']} vectors"
    )

    # ---- 6. The changefeed loop: upserts AND deletes (cdc_rollup_state) -
    state_dir = tempfile.mkdtemp(prefix="ex_cdc_")
    old = events.where(F.col("ts") < CUTOFF)
    new = events.where(F.coalesce(F.col("ts") >= CUTOFF, F.lit(True)))
    CDC.apply_cdc_batch(
        spark, old.withColumn("op", F.lit("upsert")), state_dir, epoch=1
    )
    b2 = new.withColumn("op", F.lit("upsert")).unionByName(
        old.where(F.pmod(F.col("user_id"), F.lit(41)) == 0).withColumn(
            "op", F.lit("delete")
        )
    )
    CDC.apply_cdc_batch(spark, b2, state_dir, epoch=2)
    CDC.apply_cdc_batch(spark, b2, state_dir, epoch=2)  # crash replay: no-op
    final = CDC.read_rollup_state(spark, state_dir)
    print(f"CDC-maintained rollup groups (replay-safe): {final.count()}")

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
