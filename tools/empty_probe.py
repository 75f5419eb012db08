"""Empty-input probe: which registry entries survive zero-row tables?

At 100 TB an empty slice is routine — a source with no documents today, an
events partition with no rows for an hour, an embeddings shard that
filtered to nothing. The dirty-mirror gate (tests/test_dirty_mirror.py)
covers MALFORMED rows; this probe covers ABSENT rows: every table present
with its exact schema but zero rows. A distributed job over an empty
slice must produce an empty (or well-defined degenerate) result, never
crash on `.collect()[0]`, a None-propagating max(), or a cutoff derived
from an empty sample.

Usage: python tools/empty_probe.py [--rows N] [entry ...]
Prints one line per entry: ok/rows, or the exception type+message.

``--rows N`` probes N-row tables instead of zero-row ones — the "tiny
slice" shape (a 1-row source) hits different edges than the empty one:
ANSI INVALID_ARRAY_INDEX on second-nearest lookups, k-greater-than-n
training, window frames over a single row.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from auto_vectordb_spark.plans.parity import REGISTRY, TABLES  # noqa: E402

SRC = "/root/testdata/sf0.001"


def make_empty_dir(dst: str, rows: int = 0) -> None:
    con = duckdb.connect()
    for t in TABLES:
        # deterministic slice: lowest-key rows, so reruns probe the same data
        order = "1" if rows == 0 else "ALL"
        tbl = con.execute(
            f"SELECT * FROM '{SRC}/{t}.parquet' ORDER BY {order} LIMIT {rows}"
        ).fetch_arrow_table()
        pq.write_table(tbl, f"{dst}/{t}.parquet")
    con.close()


def main() -> None:
    import tempfile

    from auto_vectordb_spark.session import get_spark

    argv = sys.argv[1:]
    rows = 0
    if argv[:1] == ["--rows"]:
        rows = int(argv[1])
        argv = argv[2:]
    names = argv or list(REGISTRY)
    dst = tempfile.mkdtemp(prefix=f"empty_sf_{rows}_")
    make_empty_dir(dst, rows)
    spark = get_spark(cpus=8)
    ok, failed = 0, {}
    for name in names:
        try:
            n = len(REGISTRY[name].spark(spark, dst).collect())
            print(f"ok    {name}: {n} rows", flush=True)
            ok += 1
        except Exception as e:  # noqa: BLE001 — any crash is the finding
            msg = f"{type(e).__name__}: {str(e).splitlines()[0][:160]}"
            print(f"FAIL  {name}: {msg}", flush=True)
            failed[name] = msg
    print(f"\n{ok}/{len(names)} survive empty input")
    if failed:
        print(f"failing ({len(failed)}): {sorted(failed)}")


if __name__ == "__main__":
    main()
