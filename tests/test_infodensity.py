"""operators/infodensity.py — compression-ratio information density.

The entry is rows-only (no SQL zlib), so this file IS its correctness
gate: the Arrow kernel's sizes must match a pure-Python zlib reference
bit-for-bit on the same fixture rows, and the per-source report must
equal the reference aggregation exactly.
"""

import zlib
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from auto_vectordb_spark.operators import infodensity as ID
from auto_vectordb_spark.plans.parity import load_views

SF = "/root/testdata/sf0.001"


def _round6_half_up(z: int, n: int) -> float:
    """Spark's F.round is HALF_UP; Python's built-in round is half-even,
    and the two disagree whenever the ratio has an exact 5 in the 7th
    decimal (dyadic ratios like k/128 = 0.0078125 do). The reference
    must mirror Spark's semantics, not Python's."""
    return float(
        (Decimal(z) / Decimal(n)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )


def _ref_sizes(rows):
    out = {}
    for doc_id, source, text in rows:
        if doc_id is None or text is None:
            continue
        b = text.encode("utf-8", errors="replace")
        out[doc_id] = (source, len(b), len(zlib.compress(b, ID.ZLIB_LEVEL)))
    return out


def test_kernel_matches_python_zlib_bit_exact(spark):
    t = load_views(spark, SF)
    docs = t["documents"].select("doc_id", "source", "text")
    want = _ref_sizes([(r.doc_id, r.source, r.text) for r in docs.collect()])
    got = {
        r.doc_id: (r.source, r.n_bytes, r.z_bytes)
        for r in ID.compression_sizes(t["documents"]).collect()
    }
    assert got == want
    assert len(got) > 0


def test_report_matches_reference_aggregation(spark):
    t = load_views(spark, SF)
    docs = t["documents"].select("doc_id", "source", "text")
    sizes = _ref_sizes([(r.doc_id, r.source, r.text) for r in docs.collect()])
    ref = {}
    for source, n, z in sizes.values():
        if n == 0:
            continue  # an empty doc has no density
        ratio = _round6_half_up(z, n)
        r6 = int(round(ratio * 1_000_000))
        agg = ref.setdefault(source, [0, 0, None, None, 0])
        agg[0] += 1
        agg[1] += r6
        agg[2] = ratio if agg[2] is None else min(agg[2], ratio)
        agg[3] = ratio if agg[3] is None else max(agg[3], ratio)
        agg[4] += 1 if ratio <= 0.45 else 0
    got = {
        r.source: [r.n_docs, r.sum_ratio_6d, r.ratio_lo, r.ratio_hi, r.n_high_redundancy]
        for r in ID.compression_density_by_source(t["documents"]).collect()
    }
    assert got == ref


def test_round_reference_matches_spark_half_up_on_dyadic_tie(spark):
    """z/n = 1/128 = 0.0078125 has an exact 5 in the 7th decimal: Spark's
    F.round (HALF_UP) gives 0.007813 while Python's built-in round
    (half-even) gives 0.007812 — the reference helper must take Spark's
    side or the bit-exact gate has a data-dependent hole."""
    got = spark.sql(
        "SELECT round(CAST(1 AS DOUBLE) / 128, 6) AS r"
    ).first().r
    assert got == _round6_half_up(1, 128) == 0.007813
    assert round(1 / 128, 6) == 0.007812  # the trap this guards against


def test_redundant_text_scores_lower(spark):
    """The signal must actually separate boilerplate from varied text."""
    rows = [
        (1, "a", "spam spam spam spam " * 50),
        (2, "a", "the quick brown fox jumps over the lazy dog and then "
                  "wanders across seventeen distinct meadows naming each one"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, source: string, text: string")
    sizes = {r.doc_id: r.z_bytes / r.n_bytes for r in ID.compression_sizes(df).collect()}
    assert sizes[1] < 0.25 < sizes[2]


def test_null_and_empty_rows_fail_row_not_job(spark):
    rows = [
        (1, "a", "real text of reasonable, varied content"),
        (2, "a", None),
        (None, "a", "orphaned"),
        (3, "b", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, source: string, text: string")
    got = ID.compression_sizes(df).collect()
    assert {r.doc_id for r in got} == {1, 3}
    rep = ID.compression_density_by_source(df).collect()
    # source b's only doc is empty -> no density row for it
    assert {r.source for r in rep} == {"a"}
    # empty input end-to-end
    empty = spark.createDataFrame([], "doc_id: long, source: string, text: string")
    assert ID.compression_density_by_source(empty).count() == 0
