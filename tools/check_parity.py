"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry via Spark AND its ``oracle_sql()`` via DuckDB
on the same sf dir, then compares row count, column names/order-insensitive
sorted values, AND exact result-schema type parity (tools/typegate.py — the
stringified value compare alone is blind to DuckDB HUGEINT/decimal128
finals, the r4/r5 term_drift_by_source driver-red class). Exit code 1 on
any mismatch.

Usage: python tools/check_parity.py [sf_dir] [query ...]
       python tools/check_parity.py --json OUT.json [sf_dir] [query ...]

``--json`` additionally writes a per-entry record
{name: {status, rows, seconds, oracle}} — committed per round as
PARITY_LOCAL_r{N}.json so entries OUTSIDE the driver's 50-entry
attestation window still have an on-record, per-round local pass (the
complement of the rotating-window honesty guard in tools/next_window.py).
"""

from __future__ import annotations

import gc
import json as _json
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import typegate  # noqa: E402

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
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    records: dict[str, dict] = {}
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

    # Warm the session BEFORE the timed loop (r12 verdict #8): the first
    # registry entry otherwise absorbs the one-time costs — JVM/codegen
    # warm-up, first parquet footer reads, load_views setup — which made
    # o1_sort_limit (registry entry #0, a TakeOrderedAndProject plan)
    # read as "6.3 s" in PARITY_LOCAL_r12 and poisoned the sweep's value
    # as a profiling signal. One cheap action per base view; the
    # per-entry `seconds` below are unchanged in meaning (spark collect +
    # oracle + gates), just no longer contaminated by startup.
    from auto_vectordb_spark.plans.parity import load_views

    for _df in load_views(spark, sf).values():
        _df.limit(1).count()

    failures = []
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        # Same per-entry hygiene bench.py adopted in r12: py4j releases a
        # JVM DataFrame/RDD only after its Python proxy is collected, so
        # dead proxies from earlier entries keep persisted/localCheckpointed
        # blocks alive and late entries pay eviction/GC pressure for the
        # whole sweep's leftovers (r12 sweep showed split_manifest_consumed
        # at "11.1 s" vs ~2.3 s in a clean warm session — the structure was
        # fine, the signal was contaminated). Collect Python first, then
        # JVM, then drop caches — all OUTSIDE the per-entry timer.
        gc.collect()
        spark._jvm.System.gc()  # noqa: SLF001
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            sdf = q.spark(spark, sf)
            s_rows = sdf.collect()
            s_cols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            records[name] = {"status": "spark_error", "rows": None,
                             "seconds": round(time.time() - t0, 2), "oracle": False}
            continue
        if q.sql is None:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            ok_rows = len(s_rows) > 0
            if not ok_rows:
                print(f"FAIL  {name}: zero rows — a rows-only check proves nothing empty")
                failures.append(name)
            records[name] = {"status": "rows_only" if ok_rows else "rows_only_empty",
                             "rows": len(s_rows),
                             "seconds": round(time.time() - t0, 2), "oracle": False}
            continue
        try:
            res = con.execute(q.sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            records[name] = {"status": "duckdb_error", "rows": len(s_rows),
                             "seconds": round(time.time() - t0, 2), "oracle": True}
            continue
        # Exact-type gate (round-5 verdict #3): the stringified value
        # compare below is blind to DuckDB HUGEINT/decimal128 finals, which
        # the driver's type-sensitive hash rejects even on bit-equal values
        # (the r4/r5 term_drift_by_source red rows). DESCRIBE binds without
        # re-executing the oracle.
        try:
            terrs = typegate.type_mismatches(
                sdf.schema, typegate.duck_result_types(con, q.sql))
        except Exception as e:  # noqa: BLE001
            terrs = [f"type gate error: {e}"]
        if terrs:
            for msg in terrs:
                print(f"FAIL  {name}: type parity: {msg}")
            failures.append(name)
            records[name] = {"status": "types", "rows": len(s_rows),
                             "seconds": round(time.time() - t0, 2), "oracle": True}
            continue
        shape_err = driver_shape_error(s_cols, [tuple(r) for r in s_rows])
        if shape_err:
            print(f"FAIL  {name}: driver canonicalizer would crash: {shape_err}")
            failures.append(name)
            records[name] = {"status": "driver_shape_error", "rows": len(s_rows),
                             "seconds": round(time.time() - t0, 2), "oracle": True}
            continue
        sc, sv = norm_rows(s_cols, [tuple(r) for r in s_rows])
        dc, dv = norm_rows(d_cols, d_rows)
        # one status per entry, most-specific failure mode wins; a name
        # enters `failures` at most once (per-entry modes: ok / empty /
        # columns / rowcount / values — distinct in the --json evidence)
        status = "ok"
        if sc != dc:
            status = "columns"
            print(f"FAIL  {name}: columns differ spark={sc} duck={dc}")
        elif len(sv) != len(dv):
            status = "rowcount"
            print(f"FAIL  {name}: rowcount spark={len(sv)} duck={len(dv)}")
        elif sv != dv:
            status = "values"
            diffs = [i for i, (a, b) in enumerate(zip(sv, dv)) if a != b][:3]
            print(f"FAIL  {name}: values differ at sorted rows {diffs}")
            for i in diffs:
                print(f"   spark: {sv[i]}\n   duck : {dv[i]}")
        elif not s_rows:
            status = "empty"
            print(f"FAIL  {name}: zero rows — an empty hash-match is vacuous")
        if status == "ok":
            print(f"ok    {name}: {len(sv)} rows [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)
        records[name] = {
            "status": status,
            "rows": len(sv),
            "seconds": round(time.time() - t0, 2),
            "oracle": True,
        }
    print(f"\n{len(REGISTRY) - len(failures)}/{len(REGISTRY)} pass")
    if json_out:
        n_ok = sum(1 for r in records.values() if r["status"] in ("ok", "rows_only"))
        _json.dump(
            {"sf_dir": sf, "entries": records,
             "summary": {"pass": n_ok, "total": len(records),
                         "failures": sorted(set(failures))}},
            open(json_out, "w"), indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
