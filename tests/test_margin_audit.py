"""Rounding-boundary gates over the oracle registry (round-4 verdict #2).

Round 4's one driver-red row (term_drift_by_source) was a display-rounded
column whose values are RECONSTRUCTED from quantized int64 sums: such
values live on a lattice (v·10^s integral) finer than the d-decimal
rounding grid, so lattice points land at arbitrary offsets inside the grid
— including, at sf0.01, 4e-9 from a boundary — and a one-quantum
cross-engine disagreement anywhere upstream moves the rounded output a
full grid step. No margin is safe for that shape; the fix is to emit the
integer itself (see textstats.term_drift_by_source).

Flip physics, for the record (what is and is not gated):

- RECONSTRUCTED (lattice) columns under a display round — GATED here,
  zero tolerance. The r4 failure class; margins observed as large as
  4e-3 grid units flipped in the driver environment.
- Display rounds over IEEE-exact chains on identical inputs (+,-,*,/,
  sqrt over parquet values / exact ints) — both engines produce
  bit-identical doubles, so only a rounding-MODE divergence at an EXACT
  tie can flip. Remaining exact-tie columns (dyadic rationals in
  text_quality.quality, q2_cheapest_supplier.unit_price,
  quality_weighted_sample.quality) are documented, not gated: Spark
  (HALF_UP) and DuckDB both round half-away today — pinned cross-engine
  by test_round_tie_mode_agreement below — and those entries have been
  driver-green since round 2.
- Transcendental chains (ln/exp) feeding a SINGLE quantization whose
  absolute per-item margins dwarf libm skew (parity rule 1) — safe by
  construction; the second discretization is the hazard, not the first.
"""

import math

import duckdb
import pytest

from auto_vectordb_spark.plans.parity import REGISTRY, TABLES

import sys

sys.path.insert(0, "/root/repo/tools")
import margin_audit as MA  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_strip_display_rounds_unit():
    sql = (
        "SELECT round(a / b, 6) AS x, round(c * 1e9) AS q, "
        "round(d, 0) AS z, CAST(round(e * 100) AS BIGINT) AS cents FROM t"
    )
    out, aliases = MA.strip_display_rounds(sql)
    assert aliases == {"x": 6}
    assert "(a / b) AS x" in out
    # quantization rounds (one-arg, or d < 4) are untouched
    assert "round(c * 1e9) AS q" in out
    assert "round(d, 0) AS z" in out
    assert "round(e * 100)" in out


def test_lattice_scale_unit():
    # reconstructed-from-1e-9-quantized values
    assert MA.lattice_scale([0.011526504, 0.5, 1.25e-3]) == 9
    # plain integral values
    assert MA.lattice_scale([3.0, 17.0]) == 0
    # generic continuous values: no lattice
    assert MA.lattice_scale([math.pi / 10, math.e / 10]) is None


def test_no_reconstructed_rounded_columns():
    """ZERO oracle-paired entries may display-round a lattice-valued
    (quantized-sum-reconstructed) column — the exact shape that went
    driver-red in round 4. Runs every stripped oracle in DuckDB at the
    smoke SF; a stripped oracle that fails to parse is itself a failure."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    offenders: dict[str, list[str]] = {}
    for name, q in REGISTRY.items():
        if q.sql is None:
            continue
        stripped, aliases = MA.strip_display_rounds(q.sql)
        if not aliases:
            continue
        res = con.execute(stripped)
        cols = [d[0] for d in res.description]
        rows = res.fetchall()
        bad = []
        for col, d in aliases.items():
            if col not in cols:
                continue
            i = cols.index(col)
            vals = [r[i] for r in rows if isinstance(r[i], float)]
            if not vals:
                continue
            s = MA.lattice_scale(vals)
            if s is not None and s > d:
                bad.append(f"{col} (lattice 1e-{s} under 1e-{d} grid)")
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "display-rounded reconstructed (lattice) columns — emit the exact "
        f"integer instead (see term_drift_by_source): {offenders}"
    )


def test_round_tie_mode_agreement(spark):
    """Spark and DuckDB must agree on round() at EXACT .5 ties (both
    half-away-from-zero). The dyadic-rational tie columns left rounded in
    the registry (see module docstring) are safe exactly as long as this
    holds — if an engine upgrade ever switches to half-even, this fires
    before the driver does."""
    # a value is a COMPUTATIONAL tie when v*10^d lands exactly on k+0.5 in
    # double arithmetic (that is what the margin audit measures and what
    # the registry's dyadic ratios produce); generate candidates the same
    # way and keep the exact ties
    d = 6
    cands = [(k + 0.5) / 10**d for k in (0, 1, 125000, 437500, 999999)]
    cands += [-v for v in cands]
    ties = [v for v in cands if (v * 10**d) - math.floor(v * 10**d) == 0.5]
    assert len(ties) >= 4  # the construction must actually produce ties
    duck = duckdb.connect()
    for v in ties:
        got_duck = duck.execute(f"SELECT round(CAST({v!r} AS DOUBLE), {d})").fetchone()[0]
        got_spark = spark.sql(f"SELECT round(CAST({v!r} AS DOUBLE), {d})").collect()[0][0]
        # the invariant the registry's tie columns rely on: both engines
        # make the SAME call on an exact tie (today: half-away-from-zero)
        assert got_duck == got_spark, (v, got_duck, got_spark)
        assert abs(got_spark) == pytest.approx(
            (math.floor(abs(v) * 10**d) + 1) / 10**d, abs=1e-12
        ), (v, got_spark)


def test_presum_contribution_margins():
    """Round-5 verdict #6: every transcendental-quantized per-item
    contribution (the sum(CAST(round(<ln chain> * 10^s) AS BIGINT)) shape)
    must sit >= 1e-6 quantization units from its .5 rounding boundary —
    one under-margin item is one libm build away from flipping the exact
    integer sum and the driver hash. Probes are rebuilt mechanically from
    each oracle's own SQL (same CTEs, same row source); a probe that fails
    to parse is itself a failure. The final-column audit alone gives false
    confidence here: term_drift-class entries emit exact integers, so they
    are invisible to strip_display_rounds."""
    GATE = 1e-6
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    offenders: dict[str, list[str]] = {}
    n_probes = 0
    for name, q in REGISTRY.items():
        if q.sql is None:
            continue
        for snippet, probe_sql in MA.presum_probes(q.sql, GATE):
            n_probes += 1
            try:
                n_items, mn, n_under = con.execute(probe_sql).fetchone()
            except Exception as e:  # noqa: BLE001
                offenders.setdefault(name, []).append(
                    f"probe failed to parse/run ({snippet}): {e}"
                )
                continue
            if n_items and n_under:
                offenders.setdefault(name, []).append(
                    f"{n_under}/{n_items} contributions under {GATE} units "
                    f"(min {mn:.3e}) for {snippet}"
                )
    # the known transcendental-quantized entries must all be probed
    assert n_probes >= 8, f"presum extractor found only {n_probes} probes"
    assert not offenders, (
        "pre-sum contribution margins within libm skew of a rounding "
        f"boundary — requantize coarser or reshape: {offenders}"
    )


def test_presum_probe_extractor_unit():
    """The probe builder finds a transcendental one-arg round inside a CTE
    and rebuilds a query over that CTE's own row source."""
    sql = """
    WITH base AS (SELECT doc_id, n_chars FROM documents WHERE n_chars > 0),
    contrib AS (
      SELECT doc_id,
             CAST(round(ln(CAST(n_chars AS DOUBLE)) * 1e6) AS BIGINT) AS q
      FROM base WHERE doc_id >= 0
    )
    SELECT doc_id, CAST(sum(q) AS BIGINT) AS s FROM contrib GROUP BY doc_id
    """
    probes = MA.presum_probes(sql, 1e-6)
    assert len(probes) == 1
    _, probe_sql = probes[0]
    assert "FROM base WHERE doc_id >= 0" in probe_sql
    assert "GROUP BY" not in probe_sql.split("WITH", 1)[1].rsplit("SELECT", 1)[1]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    n_items, mn, n_under = con.execute(probe_sql).fetchone()
    assert n_items > 0 and 0.0 <= mn <= 0.5 and n_under == 0
