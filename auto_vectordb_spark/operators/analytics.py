"""Event-volume analytics: ingest-health monitors over an event firehose.

North-star extension beyond the reference's query surface (the reference has
no monitoring ops; its closest analog is the row-count bookkeeping in
/root/reference/backend/process/postgres.py) — the monitors a streaming
ingest pipeline runs on its own volume to catch drops/bursts.

All three detectors reduce the firehose to an (event_type, hour) count table
FIRST — at 100 TB the raw events shuffle exactly once on a short composite
key with map-side combine, and every statistic after that runs on the tiny
reduced table (per-type aggregation + a broadcast join-back):

- :func:`hourly_counts` — the shared reduction.
- :func:`volume_anomaly_zscore` — per-type z-score of hourly counts against
  that type's own mean/std (moments from exact int64 sums).
- :func:`volume_anomaly_mad` — robust median/MAD twin (one wild hour
  inflates a std enough to mask itself; it barely moves a median). Plain
  MAD with a threshold knob — no 1.4826 normal-consistency constant baked.
- :func:`seasonal_deviation` — hour-of-day baselines per type (2am traffic
  judged against 2am norms, not the daily mean — the deviation flat
  z-score/MAD monitors misclassify on any diurnal workload).

Oracle-verified via plans/parity.py entries events_anomaly_zscore /
events_anomaly_mad / events_seasonal_deviation (exact integer moment sums
and interpolated percentiles over integer counts are bit-identical across
engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_counts(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    with_hod: bool = False,
) -> DataFrame:
    """(event_type, hour, [hod,] n_events) — the shared firehose reduction.

    One shuffle on the short (type, hour) key, map-side combined; `hour` is
    a formatted string so the output is engine- and timezone-stable under
    the session's pinned UTC TZ.

    Null handling: a monitor must not silently drop data, and plain-SQL
    equi-joins downstream WOULD drop null keys — so null event types are
    bucketed as ``__null__``, null timestamps as ``hour = '__null__'`` (one
    explicit unstamped-events cell per type, join-safe downstream), and
    ``hod = -1`` in the seasonal monitor. A flood of typeless or unstamped
    events is itself an ingest-health signal.
    """
    keys = [
        F.coalesce(F.col(type_col), F.lit("__null__")).alias("event_type"),
        F.coalesce(
            F.date_format(F.date_trunc("hour", F.col(ts_col)), "yyyy-MM-dd HH:00"),
            F.lit("__null__"),
        ).alias("hour"),
    ]
    if with_hod:
        keys.append(F.coalesce(F.hour(F.col(ts_col)), F.lit(-1)).alias("hod"))
    return events.groupBy(*keys).agg(F.count("*").alias("n_events"))


def volume_anomaly_zscore(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    threshold: float = 2.0,
) -> DataFrame:
    """(event_type, hour, n_events, z, is_anomaly) — per-type z-score of
    hourly volume against that type's own mean/std.

    Moments come from exact int64 sums (s1, s2) so z is bit-identical
    cross-engine; a zero-variance type scores z=0 (never anomalous).
    """
    hourly = hourly_counts(events, type_col, ts_col)
    stats = hourly.groupBy("event_type").agg(
        F.count("*").alias("n_hours"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    j = hourly.join(F.broadcast(stats), "event_type")
    mean = F.col("s1").cast("double") / F.col("n_hours")
    var = F.col("s2").cast("double") / F.col("n_hours") - mean * mean
    z = F.when(var > 0, (F.col("n_events") - mean) / F.sqrt(var)).otherwise(F.lit(0.0))
    return j.select(
        "event_type",
        "hour",
        "n_events",
        F.round(z, 6).alias("z"),
        (F.abs(z) >= float(threshold)).alias("is_anomaly"),
    )


def volume_anomaly_mad(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    threshold: float = 3.0,
) -> DataFrame:
    """(event_type, hour, n_events, med, mad, is_anomaly) — robust
    median/MAD hourly anomaly detection.

    Exact interpolated percentiles on the REDUCED hourly table (two tiny
    per-type aggregations + join-backs); integer counts make the
    interpolation arithmetic bit-identical across engines. A zero-MAD type
    (more than half its hours at the median) never flags.
    """
    hourly = hourly_counts(events, type_col, ts_col)
    med = hourly.groupBy("event_type").agg(
        F.percentile("n_events", F.lit(0.5)).alias("med")
    )
    dev = hourly.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("n_events") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.percentile("adev", F.lit(0.5)).alias("mad"))
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "hour",
        "n_events",
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        ((F.col("mad") > 0) & (F.col("adev") > float(threshold) * F.col("mad"))).alias(
            "is_anomaly"
        ),
    )


def seasonal_deviation(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(event_type, hour, n_events, expected, deviation) — each hour compared
    to its OWN hour-of-day baseline per event type.

    Two short-key aggregations over the reduced hourly table; exact integer
    sums make the baseline division engine-exact.
    """
    hourly = hourly_counts(events, type_col, ts_col, with_hod=True)
    baseline = hourly.groupBy("event_type", "hod").agg(
        F.count("*").alias("n_obs"), F.sum("n_events").alias("s1")
    )
    expected = F.col("s1").cast("double") / F.col("n_obs")
    return hourly.join(F.broadcast(baseline), ["event_type", "hod"]).select(
        "event_type",
        "hour",
        "n_events",
        F.round(expected, 6).alias("expected"),
        F.round(F.col("n_events") - expected, 6).alias("deviation"),
    )


def source_embedding_drift(
    embeddings: DataFrame,
    docs: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    doc_id_col: str = "doc_id",
    source_col: str = "source",
    quant_scale: int = 6,
) -> DataFrame:
    """Embedding-space drift monitor across corpus sources: pairwise cosine
    similarity of per-source CENTROID vectors — the companion to the
    token-space :func:`~..textstats.term_drift_by_source` (two sources can
    share vocabulary yet drift semantically, or vice versa; a centroid
    cosine falling round-over-round is the cheap first alarm before
    per-cluster analysis).

    Output: (src_a, src_b, n_a, n_b, cos) for src_a < src_b.

    Cross-engine determinism: per-(source, dim) sums are int64-quantized
    (parity rule 1); centroids are dequantized by ONE exact-int division
    each (sum_q / (10^s · n) — both operands exactly representable, IEEE
    division is correctly rounded → bit-identical); the dot/norm reductions
    run in fixed dim order (sequential array fold, the oracle-proven
    cosine twin); the final round(cos, 6) is a display round over a
    continuous value (margin-audited).

    Scale: the corpus pays one (source, dim) shuffle with map-side combine
    (the embedding_dim_stats shape, keyed finer); everything after operates
    on s·d rows and the s² pair join of s centroid vectors — broadcast
    territory for any real source count.
    """
    from ..functions import vector as V

    scale = 10**quant_scale
    ex = embeddings.join(
        docs.select(F.col(doc_id_col).alias(id_col), F.col(source_col).alias("source")),
        id_col,
    ).select(
        "source", F.posexplode(V.as_double_array(F.col(vec_col))).alias("dim", "x")
    )
    sums = ex.groupBy("source", "dim").agg(
        F.sum(F.round(F.col("x") * F.lit(scale), 0).try_cast("long")).alias("sq"),
        F.count("*").alias("n"),
    )
    # Each centroid element divides by ITS OWN (source, dim) count — the
    # oracle's bare `n` inside list() binds per-row to sums.n, so on
    # ragged/short vectors (posexplode emitting fewer rows for missing
    # dims) a per-source max(n) denominator would diverge cross-engine
    # and understate under-populated dims.
    vecs = (
        sums.groupBy("source")
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "sq", "n"))).alias("__a"),
            F.max("n").alias("n"),
        )
        .select(
            "source",
            "n",
            F.transform(
                "__a",
                lambda s: s["sq"].cast("double")
                / (F.lit(float(scale)) * s["n"]),
            ).alias("m"),
        )
    )
    a, b = vecs.alias("a"), vecs.alias("b")
    pairs = F.broadcast(a).join(b, F.col("a.source") < F.col("b.source"))
    return pairs.select(
        F.col("a.source").alias("src_a"),
        F.col("b.source").alias("src_b"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.round(V.cosine(F.col("a.m"), F.col("b.m")), 6).alias("cos"),
    )


def recency_weighted_volume(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    half_life_us: int = 604_800_000_000,  # 7 days
    max_halflives: int = 20,
) -> DataFrame:
    """(event_type, n_events, weighted_q, weighted) — exponentially
    decayed event volume with a dyadic-exact half-life weighting.

    Freshness-weighted counts are the monitoring/sampling primitive for
    "how active is this event type NOW" — but ``exp(-λ·age)`` is a libm
    call whose low bits differ across engines. This operator makes decay
    EXACT: age is bucketed to whole half-lives by integer division
    (``h = age_us DIV half_life_us``, capped at ``max_halflives``) and the
    weight is the integer ``2^(max_halflives − h)`` — a bit shift, no
    float anywhere until the final dyadic division ``weighted =
    weighted_q / 2^max_halflives`` (exact in IEEE, bit-identical
    everywhere). Null timestamps are EXCLUDED (documented, not a bucket:
    a null age has no decay semantics).

    Scale shape: one 1-row max-timestamp aggregate broadcast to the scan,
    then one short-key groupBy with map-side combine.
    """
    um = F.unix_micros(F.col(ts_col))
    mx = events.agg(F.max(um).alias("__mx"))
    e = (
        events.filter(F.col(ts_col).isNotNull())
        .crossJoin(F.broadcast(mx))
        .select(
            F.col(type_col).alias("event_type"),
            (F.col("__mx") - um).alias("__age_us"),
        )
        .select(
            "event_type",
            # exact int64 floor division — a double divide + cast can land
            # on the wrong side of a whole-half-life boundary
            F.least(
                F.expr(f"__age_us DIV {half_life_us}"), F.lit(max_halflives).cast("long")
            ).alias("__h"),
        )
        .withColumn(
            "__w_q",
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({max_halflives} - __h AS INT))"),
        )
    )
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("__w_q").alias("weighted_q"),
        (F.sum("__w_q").cast("double") / F.lit(float(2**max_halflives))).alias(
            "weighted"
        ),
    )
