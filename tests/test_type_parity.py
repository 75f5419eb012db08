"""Registry-wide cross-engine TYPE parity gate (round-5 verdict #3).

The r4/r5 driver-red row (``term_drift_by_source``) was a schema-type
artifact: an uncast DuckDB ``sum(BIGINT)`` final column is HUGEINT
(Arrow ``decimal128(38,0)``) while Spark emits int64 — values bit-equal,
driver hash red, and the value-normalizing local compare structurally
unable to see it. This test binds every oracle (``DESCRIBE`` — no
execution) and builds every Spark plan lazily (no job beyond what plan
construction itself needs), then asserts the tools/typegate.py contract:

- no DuckDB final column may be HUGEINT / DECIMAL / unsigned (they
  surface as ``Decimal``, not ``int``);
- per column name, the type CLASS (integral / floating / string /
  boolean / date / timestamp) must match between engines. Width may
  differ — DuckDB ``row_number()`` is BIGINT vs Spark's int32, and such
  entries have been driver-green since round 2.
"""

import sys

import duckdb
import pytest

from auto_vectordb_spark.plans.parity import REGISTRY, TABLES

sys.path.insert(0, "/root/repo/tools")
import typegate  # noqa: E402

SF = "/root/testdata/sf0.001"

_ORACLE_PAIRED = sorted(n for n, q in REGISTRY.items() if q.sql is not None)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


def test_registry_type_parity(spark, duck):
    """Every oracle-paired entry passes the exact-type gate."""
    failures = {}
    for name in _ORACLE_PAIRED:
        q = REGISTRY[name]
        try:
            duck_types = typegate.duck_result_types(duck, q.sql)
        except Exception as e:  # noqa: BLE001
            failures[name] = [f"oracle DESCRIBE failed: {e}"]
            continue
        try:
            schema = q.spark(spark, SF).schema
        except Exception as e:  # noqa: BLE001
            failures[name] = [f"spark plan build failed: {e}"]
            continue
        errs = typegate.type_mismatches(schema, duck_types)
        if errs:
            failures[name] = errs
    assert not failures, "\n".join(
        f"{n}: {'; '.join(msgs)}" for n, msgs in sorted(failures.items())
    )


def test_gate_catches_hugeint(duck):
    """The gate itself rejects the exact r4/r5 failure shape."""
    from pyspark.sql.types import LongType, StructField, StructType

    duck_types = typegate.duck_result_types(
        duck, "SELECT doc_id, sum(doc_id) AS s FROM documents GROUP BY doc_id"
    )
    assert duck_types["s"].startswith(("HUGEINT", "DECIMAL"))
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("s", LongType())]
    )
    errs = typegate.type_mismatches(schema, duck_types)
    assert len(errs) == 1 and "CAST it" in errs[0]


def test_gate_catches_class_mismatch():
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType([StructField("n", DoubleType())])
    errs = typegate.type_mismatches(schema, {"n": "BIGINT"})
    assert len(errs) == 1 and "type-class mismatch" in errs[0]


def test_gate_allows_integral_width_skew():
    """DuckDB row_number() BIGINT vs Spark int32 — driver-green since r2."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    schema = StructType([StructField("rank", IntegerType())])
    assert typegate.type_mismatches(schema, {"rank": "BIGINT"}) == []


def test_describe_predicts_arrow_surface(duck):
    """The gate trusts DESCRIBE (bind-only) as a proxy for the Arrow
    schema the driver actually hashes. Validate that proxy on executed
    oracles: every DESCRIBE type must map to the fetched Arrow type's
    class, and no executed final column may surface as decimal128 — the
    r4/r5 driver-red type. Runs a representative slice (the five
    cast-fixed entries + every distinct DESCRIBE type seen)."""
    must_check = {
        "term_drift_by_source", "vocab_growth_curve", "oov_rate_by_lang",
        "rag_context_pack", "maxsim_late_interaction",
    }
    arrow_class = {
        "int8": "integral", "int16": "integral", "int32": "integral",
        "int64": "integral", "float": "floating", "double": "floating",
        "string": "string", "large_string": "string", "bool": "boolean",
        "date32[day]": "date",
    }
    seen_types: set = set()
    checked = 0
    for name in _ORACLE_PAIRED:
        q = REGISTRY[name]
        duck_types = typegate.duck_result_types(duck, q.sql)
        new_types = set(duck_types.values()) - seen_types
        if name not in must_check and not new_types:
            continue
        seen_types |= new_types
        checked += 1
        tbl = duck.execute(q.sql).fetch_arrow_table()
        for field in tbl.schema:
            at = str(field.type)
            assert not at.startswith("decimal"), (
                f"{name}.{field.name}: executed oracle surfaces {at} — "
                "the driver-red type; DESCRIBE-based gate must have missed it"
            )
            dt = duck_types[field.name]
            base = dt.split("(")[0].strip()
            expect = typegate._DUCK_CLASS.get(base)
            got = arrow_class.get(
                "timestamp" if at.startswith("timestamp") else at,
                "timestamp" if at.startswith("timestamp") else None,
            )
            assert got == expect, (
                f"{name}.{field.name}: DESCRIBE said {dt} ({expect}) but "
                f"Arrow surfaced {at} ({got}) — the DESCRIBE proxy lies"
            )
    assert checked >= 5 and must_check <= set(_ORACLE_PAIRED)
