"""Incremental view maintenance: merging persisted aggregate STATE with a
new batch, attested equal to recomputing from scratch.

At 100 TB the from-scratch recompute of a derived table is the thing you
can never afford per ingest cycle — the production pattern is a PERSISTED
state table plus a per-batch merge whose algebra guarantees the merged
result equals the full recompute. This module carries that pattern for
the three aggregate classes a pipeline actually maintains, each chosen
because its state is a provable merge monoid:

* :func:`hourly_rollup` / :func:`rollup_merge` — additive aggregates
  (counts, exact int64-quantized sums). State carries the int64 PARTIALS,
  never the display doubles: integer addition is associative and
  commutative, so merge order, batch boundaries, and retries cannot
  change a bit (a double partial would drift per merge).
* :func:`topk_state` / :func:`topk_merge` — bounded-state rank
  maintenance: top-k with a total order (score desc, id asc) satisfies
  ``topk(topk(A) ∪ topk(B)) = topk(A ∪ B)``, so the state is k rows per
  group forever, no matter how many batches merged in.
* :func:`session_state` / :func:`session_merge` — the first non-trivial
  case: sessionization state does NOT merge by addition — sessions can
  STITCH across the batch boundary. Per-user state is 4 scalars
  (sessions, events, first/last timestamp); the merge subtracts one
  session when the boundary gap is within the timeout. This is exactly
  the per-key state a Structured Streaming
  ``applyInPandasWithState`` sessionizer carries — expressed as a batch
  merge so the algebra itself is oracle-attestable.
* :func:`scd2_state` / :func:`scd2_merge` — the CDC upsert: SCD-2
  validity islands concatenate across the boundary except that a
  same-state run straddling it COALESCES (the open "current" row either
  extends or is closed by the first new state change — exactly what a
  warehouse dimension-table merge does per batch). State is bounded by
  state CHANGES, never events.

Composition lives in its own module (staleness blast radius: see
MEMORY / tools/blast_radius.py). Reference scope note: the reference
system (kstyle2198/auto_vectordb) recomputes its ES index idempotently
per upload (backend/process/elasticsearch_index.py:141) — the
persist-state-and-merge posture here is that idea carried to aggregate
maintenance, part of the training-data-pipeline extension surface
(SURVEY.md step 8).

Scale shapes: every merge is one hash shuffle on the state's own group
key over state-sized (not corpus-sized) inputs plus the delta batch;
no merge ever rereads the historical raw data — that is the entire
point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 30-minute session gap, microseconds — the events_sessionize timeout.
SESSION_GAP_US = 1_800_000_000


def _cents(col: Column, scale: int = 2) -> Column:
    """Exact-sum quantization (parity rule 1): per-row round to 10^-scale
    as int64, so sums are integer-exact and merge-order-independent."""
    return F.round(col * F.lit(10**scale), 0).try_cast("long")


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Per (hour, event_type) additive state: row count and the exact
    int64 cent-quantized value sum. This is the STORED shape — partials,
    not display values — because int64 addition is the merge monoid;
    convert to display doubles only at the consumption edge
    (:func:`rollup_finalize`)."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("sum_cents"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:00").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_cents",
        )
    )


def rollup_merge(stored: DataFrame, delta_events: DataFrame) -> DataFrame:
    """Absorb a new batch into the persisted rollup: aggregate the DELTA
    only, union with the stored state, and re-add per key. One hash
    shuffle over state + delta-rollup rows (both hour×type-sized, tiny
    against the raw table); the historical raw events are never reread.
    Exactly equal to a from-scratch rollup of the union — integer
    partials make the addition associative/commutative (oracle-attested
    via :func:`rollup_finalize`)."""
    delta = hourly_rollup(delta_events)
    return (
        stored.unionByName(delta)
        .groupBy("window_start", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_cents").alias("sum_cents"),
        )
    )


def rollup_finalize(state: DataFrame) -> DataFrame:
    """Display edge: cents → double value sum (the events_hourly shape)."""
    return state.select(
        "window_start",
        "event_type",
        "n_events",
        (F.col("sum_cents").cast("double") / 100).alias("sum_value"),
    )


def topk_state(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    k: int,
    tie_break: str,
) -> DataFrame:
    """Bounded per-group state: the current top-k rows under the total
    order (score desc, tie_break asc). k rows per group no matter how
    much history merged in — the state table size is fixed by (groups ×
    k), never by ingest volume."""
    from .relational import top_k_per_group

    return top_k_per_group(df, group_cols, score_col, k, tie_break=tie_break)


def topk_merge(
    state: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    score_col: str,
    k: int,
    tie_break: str,
) -> DataFrame:
    """Merge a delta batch into the top-k state: rank the delta alone
    (bounding it to k per group first), union with the stored k rows,
    re-rank. Correct because top-k under a TOTAL order is a merge
    monoid: any row in topk(A ∪ B) is in topk(A) or topk(B), so the
    union of the two k-row sets always contains the true top-k. The
    re-rank windows over ≤2k rows per group — state-sized work."""
    bounded_delta = topk_state(delta, group_cols, score_col, k, tie_break)
    return topk_state(
        state.unionByName(bounded_delta), group_cols, score_col, k, tie_break
    )


def scd2_state(events: DataFrame) -> DataFrame:
    """Per-user SCD-2 island state over ONE batch: consecutive same-type
    event runs collapsed to (user_id, state, vf, n_events, ord) via the
    gaps-and-islands double row_number (the scd2_user_states algebra),
    with ``ord`` NORMALIZED to a contiguous per-user 1..k — the contract
    :func:`scd2_merge` needs to locate each batch's first and last
    island, and what keeps merge outputs themselves mergeable (chaining).
    State size is bounded by the number of STATE CHANGES, not events —
    the dimension-table shape a CDC pipeline upserts. NULL user/ts rows
    carry no state information and fail the row (cleanvec doctrine)."""
    from pyspark.sql.window import Window

    ev = events.where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_st = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    o = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.row_number().over(w_all).alias("rn"),
        F.row_number().over(w_st).alias("rns"),
    )
    isl = o.groupBy(
        "user_id",
        F.col("event_type").alias("state"),
        (F.col("rn") - F.col("rns")).alias("__grp"),
    ).agg(
        F.min("ts").alias("vf"),
        F.count("*").alias("n_events"),
        F.min("rn").alias("__ord0"),
    )
    w_seq = Window.partitionBy("user_id").orderBy("__ord0")
    return isl.select(
        "user_id",
        "state",
        "vf",
        "n_events",
        F.row_number().over(w_seq).cast("long").alias("ord"),
    )


def scd2_merge(older: DataFrame, newer: DataFrame) -> DataFrame:
    """CDC upsert of SCD-2 island state: merge two batches' islands where
    every ``older`` event precedes every ``newer`` event per user (the
    time-cutoff batch boundary). Islands concatenate in order — EXCEPT
    that a user whose last old island and first new island carry the SAME
    state has them COALESCED into one run (event counts add, valid-from
    stays the old island's): the upsert a warehouse dimension table runs
    per batch, where an open current row either extends or is closed by
    the first new state change. Output is normalized state again
    (contiguous ord), so batches chain: merge(merge(s1,s2),s3) equals
    one-shot :func:`scd2_state` over the union (test-pinned, exact-
    boundary cases included).

    Three joins, all keyed on user_id over ISLAND tables (state-sized —
    bounded by state changes, never by events); raw history is never
    re-read, which is what makes per-batch dimension maintenance
    affordable when the fact stream is 100 TB."""
    from pyspark.sql.window import Window

    om = older.groupBy("user_id").agg(F.max("ord").alias("__mo"))
    # stitch decision from the PRE-offset batches: last old island (ord ==
    # max) vs first new island (ord == 1), same state => coalesce
    bl = older.join(om, "user_id").where(F.col("ord") == F.col("__mo"))
    nf = newer.where(F.col("ord") == 1).select(
        "user_id",
        F.col("state").alias("__ns"),
        F.col("n_events").alias("__nn"),
    )
    stitch = (
        bl.join(nf, "user_id")
        .where(F.col("state") == F.col("__ns"))
        .select("user_id", F.col("ord").alias("__so"), "__nn")
    )
    old_adj = older.join(
        stitch, ["user_id"], "left_outer"
    ).select(
        "user_id",
        "state",
        "vf",
        (
            F.col("n_events")
            + F.when(
                F.col("__so") == F.col("ord"), F.col("__nn")
            ).otherwise(F.lit(0))
        ).alias("n_events"),
        "ord",
    )
    new_adj = (
        newer.join(om, "user_id", "left_outer")
        .join(stitch.select("user_id", F.lit(1).alias("__st")), "user_id", "left_outer")
        # a stitched user's first new island was absorbed into the old run
        .where(F.col("__st").isNull() | (F.col("ord") > 1))
        .select(
            "user_id",
            "state",
            "vf",
            "n_events",
            (F.col("ord") + F.coalesce("__mo", F.lit(0).cast("long"))).alias("ord"),
        )
    )
    merged = old_adj.unionByName(new_adj)
    w_seq = Window.partitionBy("user_id").orderBy("ord")
    return merged.select(
        "user_id",
        "state",
        "vf",
        "n_events",
        F.row_number().over(w_seq).cast("long").alias("ord"),
    )


def scd2_finalize(state: DataFrame) -> DataFrame:
    """Display edge: the scd2_user_states relation — validity intervals
    with valid_to = next island's valid_from (NULL = current row)."""
    from pyspark.sql.window import Window

    w_seq = Window.partitionBy("user_id").orderBy("ord")
    return state.select(
        "user_id",
        "state",
        F.date_format("vf", "yyyy-MM-dd HH:mm:ss").alias("valid_from_s"),
        F.date_format(F.lead("vf").over(w_seq), "yyyy-MM-dd HH:mm:ss").alias(
            "valid_to_s"
        ),
        "n_events",
    )


def session_state(
    events: DataFrame, gap_us: int = SESSION_GAP_US
) -> DataFrame:
    """Per-user sessionization state over ONE batch: sessions counted
    within the batch (the events_sessionize lag + running-sum algebra),
    plus the batch-boundary scalars the merge needs — first and last
    event timestamp. Four numbers per user: this is the state a
    streaming sessionizer keeps per key. NULL user/timestamp rows carry
    no session information and fail the row (cleanvec doctrine)."""
    from pyspark.sql.window import Window

    ev = events.where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.withColumn("prev_ts", F.lag("ts").over(w))
    flagged = lagged.withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | ((F.unix_micros("ts") - F.unix_micros("prev_ts")) > gap_us),
            1,
        ).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def session_merge(
    older: DataFrame, newer: DataFrame, gap_us: int = SESSION_GAP_US
) -> DataFrame:
    """Merge two per-user session states where every ``older`` event
    precedes every ``newer`` event for the same user (a time-cutoff
    batch boundary — the only boundary an ingest pipeline has). Sessions
    add, EXCEPT that a user whose last old event and first new event sit
    within the gap has their boundary sessions STITCHED into one — the
    non-additive step that makes sessionization the interesting merge.
    Users on one side only pass through. Output (user_id, n_sessions,
    n_events, first_ts, last_ts) remains a mergeable state, so batches
    chain: merge(merge(s1, s2), s3) = sessionize(b1 ∪ b2 ∪ b3).
    One full-outer hash join on user_id over two state-sized tables."""
    o = older.select(
        "user_id",
        F.col("n_sessions").alias("__so"),
        F.col("n_events").alias("__eo"),
        F.col("first_ts").alias("__fo"),
        F.col("last_ts").alias("__lo"),
    )
    n = newer.select(
        "user_id",
        F.col("n_sessions").alias("__sn"),
        F.col("n_events").alias("__en"),
        F.col("first_ts").alias("__fn"),
        F.col("last_ts").alias("__ln"),
    )
    j = o.join(n, "user_id", "full_outer")
    stitched = F.when(
        F.col("__lo").isNotNull()
        & F.col("__fn").isNotNull()
        & (
            (F.unix_micros("__fn") - F.unix_micros("__lo"))
            <= F.lit(gap_us)
        ),
        1,
    ).otherwise(0)
    zl = F.lit(0).cast("long")
    return j.select(
        "user_id",
        (
            F.coalesce("__so", zl) + F.coalesce("__sn", zl) - stitched
        ).alias("n_sessions"),
        (F.coalesce("__eo", zl) + F.coalesce("__en", zl)).alias("n_events"),
        F.coalesce("__fo", "__fn").alias("first_ts"),
        F.coalesce("__ln", "__lo").alias("last_ts"),
    )
