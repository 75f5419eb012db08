"""operators/layout_maint.py — compaction APPLY and the ranged z-order
write/probe.

The apply step is attested three ways: (1) CONTENT — main ∪ side after
compaction carries exactly the rows a from-scratch full rewrite of
base ∪ delta would (every clean event id once, payload sum exact);
(2) SEMANTICS — rewritten buckets absorbed their deltas into the main
table, deferred buckets' main partitions hold base rows only; (3)
PHYSICAL — deferred buckets' FILES are byte-identical survivors of the
initial write (same job uuid in the file name), rewritten buckets carry
the overwrite job's uuid: the defer path provably never rewrote a file.

The ranged write is attested by its footer statistics: per-file [min(z),
max(z)] from the parquet metadata must equal the logical per-chunk
bounds, files must be non-overlapping contiguous z-runs of near-equal
size, and the probe's pruned file count must match the interval
intersection the oracle recomputes.
"""

import os
import re

import pytest
from pyspark.sql import functions as F

from auto_vectordb_spark.operators import layout_maint as LM
from auto_vectordb_spark.plans.parity import load_views

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_views(spark, SF)["events"]


@pytest.fixture(scope="module")
def applied(spark, events, tmp_path_factory):
    root = tmp_path_factory.mktemp("compaction")
    main, side = str(root / "main"), str(root / "side")
    plan = LM.zorder_compaction_apply(spark, events, main, side)
    return main, side, plan


def _clean_events(events):
    return events.where(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
    )


def test_apply_content_equals_full_rewrite(spark, events, applied):
    """main ∪ side must carry exactly the rows a from-scratch rewrite of
    base ∪ delta would — every clean event id exactly once."""
    main, side, _ = applied
    schema = "event_id long, xg long, yg long, z_bucket long"
    stored = spark.read.schema(schema).parquet(main).unionByName(
        spark.read.schema(schema).parquet(side)
    )
    want = {r.event_id for r in _clean_events(events).select("event_id").collect()}
    got = [r.event_id for r in stored.select("event_id").collect()]
    assert len(got) == len(set(got)) == len(want)
    assert set(got) == want


def test_apply_semantics_per_action(spark, events, applied):
    """Rewritten buckets' main rows = base + delta; deferred buckets'
    main rows = base only, with the delta riding in the side table."""
    main, side, plan = applied
    schema = "event_id long, xg long, yg long, z_bucket long"
    main_rows = (
        spark.read.schema(schema).parquet(main)
        .groupBy("z_bucket").agg(F.count("*").alias("m")).collect()
    )
    side_rows = (
        spark.read.schema(schema).parquet(side)
        .groupBy("z_bucket").agg(F.count("*").alias("s")).collect()
    )
    m = {r.z_bucket: r.m for r in main_rows}
    s = {r.z_bucket: r.s for r in side_rows}
    for r in plan.collect():
        if r.action == "rewrite":
            assert m[r.z_bucket] == r.base_rows + r.delta_rows
            assert r.z_bucket not in s
        else:
            assert m[r.z_bucket] == r.base_rows
            assert s.get(r.z_bucket, 0) == r.delta_rows


_UUID_RE = re.compile(r"part-\d+-([0-9a-f-]{36})")


def _job_uuids_by_bucket(path: str) -> dict[int, set[str]]:
    out: dict[int, set[str]] = {}
    for d in os.listdir(path):
        if not d.startswith("z_bucket="):
            continue
        bucket = int(d.split("=")[1])
        for f in os.listdir(os.path.join(path, d)):
            mm = _UUID_RE.match(f)
            if mm:
                out.setdefault(bucket, set()).add(mm.group(1))
    return out


def test_apply_defer_files_physically_untouched(applied):
    """Spark stamps every write job's uuid into its file names: after the
    apply, deferred buckets must still carry the INITIAL write's uuid
    (their files were never rewritten) and rewritten buckets must carry a
    single different uuid (the one overwrite job) — the file-level proof
    that compaction cost is proportional to the rewritten buckets, not
    the table."""
    main, _, plan = applied
    uuids = _job_uuids_by_bucket(main)
    actions = {r.z_bucket: r.action for r in plan.collect()}
    defer_u = set().union(*(uuids[b] for b, a in actions.items() if a == "defer"))
    rewrite_u = set().union(*(uuids[b] for b, a in actions.items() if a == "rewrite"))
    assert len(defer_u) == 1, "defer buckets must keep the initial write's files"
    assert len(rewrite_u) == 1, "rewrite must be one overwrite job"
    assert defer_u != rewrite_u


def test_apply_report_reconciles_with_plan(spark, events, applied):
    main, side, plan = applied
    rep = {r.z_bucket: r for r in LM.compaction_report(spark, main, side, plan).collect()}
    pl = {r.z_bucket: r for r in plan.collect()}
    assert set(rep) == set(pl)
    total_payload = _clean_events(events).agg(F.sum("event_id")).first()[0]
    assert sum(r.sum_payload for r in rep.values()) == total_payload
    for b, r in rep.items():
        assert r.action == pl[b].action


def test_apply_empty_and_dirty(spark, tmp_path):
    """Empty corpus: empty plan, empty report (an initial write, not a
    compaction). Dirty rows (NULL id/key/ts) fail the row, never the job."""
    empty = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp"
    )
    main, side = str(tmp_path / "m0"), str(tmp_path / "s0")
    plan = LM.zorder_compaction_apply(spark, empty, main, side)
    assert plan.count() == 0
    assert LM.compaction_report(spark, main, side, plan).count() == 0

    dirty = spark.createDataFrame(
        [(None, 1, "2024-01-01 00:00:00"), (7, None, "2024-01-01 00:00:00"),
         (8, 2, None), (9, 3, "2024-01-02 12:00:00"), (20, 4, "2024-01-03 01:00:00")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    main2, side2 = str(tmp_path / "m1"), str(tmp_path / "s1")
    plan2 = LM.zorder_compaction_apply(spark, dirty, main2, side2)
    rep2 = LM.compaction_report(spark, main2, side2, plan2).collect()
    # only ids 9 (base) and 20 (delta, id % 10 == 0) survive the filter
    assert sum(r.main_rows + r.side_rows for r in rep2) == 2


def test_cycle2_absorbs_accumulated_pressure(spark, events, tmp_path):
    """The defer→accumulate→rewrite loop: cycle 2 at a tighter budget
    (5%) must absorb deferred buckets whose pressure sits in [5%, 10%),
    keep the rest riding, leave no content behind, and converge — an
    immediate third cycle at the same budget rewrites nothing."""
    main, side = str(tmp_path / "m"), str(tmp_path / "s")
    plan1 = LM.zorder_compaction_apply(spark, events, main, side)
    rep2 = LM.zorder_compaction_cycle2(spark, main, side, rewrite_pct=5)
    rows2 = {r.z_bucket: r for r in rep2.collect()}
    p1 = {r.z_bucket: r for r in plan1.collect()}
    assert set(rows2) == set(p1)
    for b, r in rows2.items():
        if p1[b].action == "rewrite":  # cycle-1 rewrites have no side left
            assert r.action == "noop" and r.side_rows == 0
        elif r.action == "rewrite":  # absorbed this cycle
            assert r.side_rows == 0
            assert r.main_rows == p1[b].base_rows + p1[b].delta_rows
            assert p1[b].delta_rows * 100 >= p1[b].base_rows * 5
        elif p1[b].delta_rows == 0:  # deferred with nothing riding
            assert r.action == "noop" and r.side_rows == 0
        else:  # still riding
            assert r.action == "defer"
            assert r.side_rows == p1[b].delta_rows
            assert p1[b].delta_rows * 100 < p1[b].base_rows * 5
    # content completeness survives the second rewrite
    schema = "event_id long, xg long, yg long, z_bucket long"
    stored = spark.read.schema(schema).parquet(main).unionByName(
        spark.read.schema(schema).parquet(side)
    )
    want = _clean_events(events).count()
    assert stored.count() == want
    assert stored.select("event_id").distinct().count() == want
    # convergence: an identical third cycle has nothing left to rewrite
    rep3 = LM.zorder_compaction_cycle2(spark, main, side, rewrite_pct=5)
    assert not [r for r in rep3.collect() if r.action == "rewrite"]


def test_compacted_probe_equals_precompaction_answer(spark, events, applied):
    """Deferring a bucket's delta must never lose it from a query: the
    compacted read path (pruned main ∪ pruned side) must return the same
    rectangle answer as a fresh single-table z-order write of the same
    events — and scan only candidate-bucket files in both tables."""
    import tempfile

    from auto_vectordb_spark.operators import layout as LAY

    main, side, plan = applied
    got = LM.zorder_compacted_probe(spark, main, side).first()
    fresh = tempfile.mkdtemp(prefix="fresh_")
    LAY.zorder_write(_clean_events(events), fresh)
    want = LAY.zorder_probe_scan(spark, fresh).first()
    assert got.n_rows == want.n_rows
    assert got.sum_payload == want.sum_payload
    # file accounting: candidate buckets present across main+side; total
    # is both tables' directory counts
    n_defer_side = len(
        [r for r in plan.collect() if r.action == "defer" and r.delta_rows > 0]
    )
    assert got.files_total == want.files_total + n_defer_side
    assert got.files_scanned <= got.files_total


def test_compacted_probe_missing_side_table(spark, events, tmp_path):
    """A probe before any defer cycle ran (side path absent) must scan
    main only, not crash — the explicit-schema/exists contract."""
    import tempfile

    from auto_vectordb_spark.operators import layout as LAY

    main = tempfile.mkdtemp(prefix="only_main_")
    LAY.zorder_write(_clean_events(events), main)
    missing = str(tmp_path / "never_written")
    got = LM.zorder_compacted_probe(spark, main, missing).first()
    want = LAY.zorder_probe_scan(spark, main).first()
    assert (got.n_rows, got.sum_payload) == (want.n_rows, want.sum_payload)
    assert got.files_total == want.files_total


def test_probe_z_intervals_compresses_exactly():
    # the standard aligned 32x32 tile is one contiguous z-run of 1024
    iv = LM.probe_z_intervals(LM.PROBE_X, LM.PROBE_Y)
    assert len(iv) == 1 and iv[0][1] - iv[0][0] + 1 == 32 * 32
    # an unaligned rectangle fragments; intervals must cover exactly its cells
    iv2 = LM.probe_z_intervals((3, 6), (5, 7))
    covered = sorted(
        z for lo, hi in iv2 for z in range(lo, hi + 1)
    )
    want = sorted(
        LM._py_spread8(x) | (LM._py_spread8(y) << 1)
        for x in range(3, 7)
        for y in range(5, 8)
    )
    assert covered == want


@pytest.fixture(scope="module")
def ranged(spark, events, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ranged") / "t")
    LM.zorder_write_ranged(events, path, n_files=16)
    return path


def test_ranged_footer_bounds_match_logical_chunks(spark, ranged):
    """Per-file parquet footer [min(z), max(z)] must equal the logical
    per-chunk bounds, files must be non-overlapping ascending z-runs, and
    chunk sizes near-equal (exact ntile, not sampled ranges)."""
    bounds = sorted(LM.file_z_bounds(spark, ranged), key=lambda t: t[1])
    t = spark.read.parquet(ranged)
    logical = sorted(
        (r.lo, r.hi, r.n)
        for r in t.groupBy("z_file")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"), F.count("*").alias("n"))
        .collect()
    )
    assert [(lo, hi) for _, lo, hi in bounds] == [(lo, hi) for lo, hi, _ in logical]
    for (_, _, hi_a), (_, lo_b, _) in zip(bounds, bounds[1:]):
        assert hi_a <= lo_b  # contiguous runs; a z value may touch the seam
    sizes = [n for _, _, n in logical]
    assert max(sizes) - min(sizes) <= 1  # equal-frequency by construction


def test_ranged_probe_matches_bruteforce_and_prunes(spark, events, ranged):
    got = LM.zorder_probe_ranged(spark, ranged).first()
    # brute force the rectangle from the UNPRUNED stored table
    t = spark.read.parquet(ranged)
    rect = F.col("xg").between(*LM.PROBE_X) & F.col("yg").between(*LM.PROBE_Y)
    want = t.where(rect).agg(
        F.count("*").alias("n"), F.sum("event_id").alias("s")
    ).first()
    assert got.n_rows == want.n
    assert got.sum_payload == want.s
    assert got.files_total == 16
    assert 0 < got.files_scanned < got.files_total  # pruning actually pruned


def test_ranged_probe_empty_table(spark, tmp_path):
    empty = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp"
    )
    path = str(tmp_path / "empty_ranged")
    LM.zorder_write_ranged(empty, path)
    r = LM.zorder_probe_ranged(spark, path).first()
    assert r.n_rows == 0 and r.files_total == 0 and r.files_scanned == 0
