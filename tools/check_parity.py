"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry via Spark AND its ``oracle_sql()`` via DuckDB
on the same sf dir, then compares row count, column names/order-insensitive
sorted values. Exit code 1 on any mismatch.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

from auto_vectordb_spark.plans.parity import REGISTRY, TABLES  # noqa: E402


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(cols), sorted(out)


def driver_shape_error(cols, rows) -> str | None:
    """Replicate the driver's canonicalization on the RAW values.

    The driver builds a pandas frame and ``sort_values`` over every column
    before hashing — which raises on unhashable cells (array/map/struct
    columns; this is exactly how pq_encode went driver-red in round 3 while
    this tool's stringified compare passed it). Running the same call here
    makes result-SHAPE errors visible locally before the driver sees them.
    """
    import pandas as pd

    try:
        pd.DataFrame(rows, columns=cols).sort_values(by=sorted(cols))
    except Exception as e:  # noqa: BLE001 — any canonicalizer error is the finding
        return f"{type(e).__name__}: {e}"
    return None


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # A deliberately BARE session — the driver invokes registry callables
    # with a vanilla SparkSession, so the local gate must prove every query
    # self-provisions its needs (ensure_session_confs runs inside
    # load_views). Engine tuning (AQE etc.) lives in session.get_spark and
    # is NOT assumed here.
    spark = SparkSession.builder.master("local[8]").appName("check_parity").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    failures = []
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.spark(spark, sf)
            s_rows = sdf.collect()
            s_cols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if q.sql is None:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            if len(s_rows) == 0:
                print(f"FAIL  {name}: zero rows — a rows-only check proves nothing empty")
                failures.append(name)
            continue
        try:
            res = con.execute(q.sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        shape_err = driver_shape_error(s_cols, [tuple(r) for r in s_rows])
        if shape_err:
            print(f"FAIL  {name}: driver canonicalizer would crash: {shape_err}")
            failures.append(name)
            continue
        sc, sv = norm_rows(s_cols, [tuple(r) for r in s_rows])
        dc, dv = norm_rows(d_cols, d_rows)
        status = "ok   "
        if sc != dc:
            status = "FAIL "
            print(f"FAIL  {name}: columns differ spark={sc} duck={dc}")
        elif len(sv) != len(dv):
            status = "FAIL "
            print(f"FAIL  {name}: rowcount spark={len(sv)} duck={len(dv)}")
        elif sv != dv:
            status = "FAIL "
            diffs = [i for i, (a, b) in enumerate(zip(sv, dv)) if a != b][:3]
            print(f"FAIL  {name}: values differ at sorted rows {diffs}")
            for i in diffs:
                print(f"   spark: {sv[i]}\n   duck : {dv[i]}")
        if status.startswith("FAIL"):
            failures.append(name)
        else:
            print(f"{status} {name}: {len(sv)} rows [{time.time()-t0:.1f}s]")
        if not s_rows:
            print(f"FAIL  {name}: zero rows — an empty hash-match is vacuous")
            failures.append(name)
    print(f"\n{len(REGISTRY) - len(failures)}/{len(REGISTRY)} pass")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
