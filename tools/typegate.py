"""Cross-engine TYPE parity gate (round-5 verdict #3).

Rounds 4 AND 5 had one driver-red row, ``term_drift_by_source`` — and the
cause was a column TYPE, not a value: its oracle's final SELECT emitted an
uncast DuckDB ``sum()`` over BIGINT, which is HUGEINT and surfaces through
Arrow as ``decimal128(38,0)`` / Python ``Decimal``, while the Spark side
emits int64. Values were bit-identical at sf0.01; a type-sensitive driver
hash fails anyway — and the local harness could never catch it because
``check_parity.norm_rows`` stringifies values before comparing. This gate
closes that blind spot: it compares the DuckDB result schema (via
``DESCRIBE <query>``, which binds without executing) against the Spark
DataFrame schema for every oracle-paired registry entry.

Calibration comes from the driver-green ledger, not theory:

- Width mismatches WITHIN the integral class are driver-safe: DuckDB
  ``row_number()``/``count(*)``/``len()`` are BIGINT while Spark's
  ``row_number()``/``size()`` are int32, and rank-emitting entries have
  been driver-green since round 2. The driver canonicalizes through
  Python objects, where both surface as plain ``int``.
- HUGEINT went driver-red with bit-equal values, twice (the r4+r5
  ``term_drift_by_source`` rows). It surfaces as ``Decimal``, not ``int``.

So the gate (a) bans outright every DuckDB final type that does NOT
surface as a native Python int/float/str/bool/date/datetime — HUGEINT,
DECIMAL, the unsigned family — and (b) requires the type CLASS (integral /
floating / string / boolean / date / timestamp) to match per column name
between the engines. It deliberately does NOT require width equality.

Used by tools/check_parity.py (always-on per entry, status ``types``) and
tests/test_type_parity.py (registry-wide, plan-only, sf0.001).
"""

from __future__ import annotations

# DuckDB final types that surface as Decimal / non-native scalars through
# both the Python client and Arrow — the driver-red class. An oracle must
# CAST these away (sum(BIGINT)->HUGEINT is the canonical offender).
FORBIDDEN_BASES = {
    "HUGEINT",
    "UHUGEINT",
    "UBIGINT",
    "UINTEGER",
    "USMALLINT",
    "UTINYINT",
    "DECIMAL",
}

_DUCK_CLASS = {
    "BIGINT": "integral",
    "INTEGER": "integral",
    "SMALLINT": "integral",
    "TINYINT": "integral",
    "DOUBLE": "floating",
    "FLOAT": "floating",
    "REAL": "floating",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
}

_SPARK_CLASS = {
    "bigint": "integral",
    "int": "integral",
    "smallint": "integral",
    "tinyint": "integral",
    "double": "floating",
    "float": "floating",
    "string": "string",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
}


def duck_result_types(con, sql: str) -> dict[str, str]:
    """Column name -> DuckDB type string for a query's FINAL schema.

    ``DESCRIBE <query>`` binds and plans without executing, so this is
    safe to run registry-wide in tests.
    """
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}


def type_mismatches(spark_schema, duck_types: dict[str, str]) -> list[str]:
    """Every cross-engine type hazard in a (spark schema, duck schema) pair.

    Empty list == type-parity holds. ``spark_schema`` is a pyspark
    StructType (lazy — no job runs); ``duck_types`` comes from
    :func:`duck_result_types`.
    """
    errs: list[str] = []
    spark_types = {f.name: f.dataType.simpleString() for f in spark_schema.fields}
    if set(spark_types) != set(duck_types):
        errs.append(
            "column names differ: spark-only="
            f"{sorted(set(spark_types) - set(duck_types))} "
            f"duck-only={sorted(set(duck_types) - set(spark_types))}"
        )
    for name in sorted(set(duck_types) & set(spark_types)):
        dt, st = duck_types[name], spark_types[name]
        base = dt.split("(")[0].strip()
        if base in FORBIDDEN_BASES:
            errs.append(
                f"{name}: oracle final type {dt} surfaces as Decimal/"
                "decimal128, not a native int — CAST it (the "
                "term_drift_by_source r4/r5 driver-red class)"
            )
            continue
        dc = _DUCK_CLASS.get(base)
        sc = _SPARK_CLASS.get(st)
        if dc is None:
            errs.append(f"{name}: unmapped duckdb final type {dt}")
        elif sc is None:
            errs.append(f"{name}: unmapped spark final type {st}")
        elif dc != sc:
            errs.append(
                f"{name}: type-class mismatch duckdb {dt} ({dc}) "
                f"vs spark {st} ({sc})"
            )
    return errs
