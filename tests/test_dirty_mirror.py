"""Dirty-mirror smoke: every registry entry must survive corrupted data.

At 100 TB there WILL be malformed rows — null/empty/whitespace/punctuation
texts, unicode and embedded-newline content, null langs/sources, zero-norm
/ NaN / overflow-magnitude / entirely-NULL embeddings, null event
types/users/values, NaN values, malformed JSON props, and NULL join keys
(doc_id/vec_id/event_id) and timestamps. A single such row must fail the ROW (NULL
out, bucket explicitly, drop from a sum), never the JOB — under Spark's
default ANSI mode the naive idioms all throw
(DIVIDE_BY_ZERO on zero-norm cosine / zero-token fertility, CAST_OVERFLOW
on quantize-round-cast over NaN, CAST_INVALID_INPUT on CSV roundtrips of
newline-bearing text, HashingTF NPE on null token arrays — all found and
fixed by this gate in round 6, 24 failing entries at first run).

The mirror copies the sf0.001 tables and injects adversarial rows into the
LLM-pipeline surface (documents / embeddings / events). TPC-H tables stay
clean: their data contract is NOT NULL, and corrupting them gates nothing
the spec promises. The test executes all 195 entries end-to-end (collect)
against the mirror and requires zero exceptions; row counts are free to
change — robustness, not parity, is the contract here (oracle parity on
clean data is tools/check_parity.py's job).
"""

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from auto_vectordb_spark.plans.parity import REGISTRY, TABLES

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dirty_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("dirty_sf")
    con = duckdb.connect()
    for t in TABLES:
        if t in ("documents", "embeddings", "events"):
            continue
        tbl = con.execute(f"SELECT * FROM '{SRC}/{t}.parquet'").fetch_arrow_table()
        pq.write_table(tbl, f"{dst}/{t}.parquet")

    d = con.execute(
        f"SELECT * FROM '{SRC}/documents.parquet' LIMIT 400"
    ).fetch_arrow_table()
    rows = d.to_pylist()
    m = max(r["doc_id"] for r in rows)
    rows += [
        dict(doc_id=m + 1, text=None, lang=None, source=None, n_chars=0),
        dict(doc_id=m + 2, text="", lang="en", source="web", n_chars=0),
        dict(doc_id=m + 3, text="   ", lang="ko", source=None, n_chars=3),
        dict(doc_id=m + 4, text="!!! ??? ...", lang=None, source="web", n_chars=11),
        dict(doc_id=m + 5, text="éé café 한글 \U0001f600 emoji mix",
             lang="xx", source="s3", n_chars=20),
        dict(doc_id=m + 6, text="x" * 5000, lang="en", source="web", n_chars=5000),
        dict(doc_id=m + 7, text="tab\tand\nnewline\r\nmix", lang="en",
             source="", n_chars=20),
        # NULL join key: groupBy treats it as a group, equi-joins drop it —
        # either way the row fails, never the job (r7 extension)
        dict(doc_id=None, text="null id doc", lang="en", source="web",
             n_chars=11),
        # companion doc for the low-id RAGGED embedding (vec_id=-2): the
        # ragged query legitimately self-matches the ragged corpus row
        # (both 3-dim -> real cosine), and pack_context_budget's loud
        # dangling-reference check is a DOCUMENTED contract, not a dirty-
        # row failure — the mirror corrupts one axis at a time
        dict(doc_id=-2, text="ragged embedding companion doc", lang="en",
             source="web", n_chars=30),
        # duplicate key with a CONFLICTING payload (retry/backfill
        # double-write): joins fan out, aggregates count both — no crash
        dict(rows[0], text="conflicting duplicate payload"),
    ]
    pq.write_table(pa.Table.from_pylist(rows, schema=d.schema),
                   f"{dst}/documents.parquet")

    e = con.execute(
        f"SELECT * FROM '{SRC}/embeddings.parquet' LIMIT 400"
    ).fetch_arrow_table()
    erows = e.to_pylist()
    dim = len(erows[0]["embedding"])
    em = max(r["vec_id"] for r in erows)
    erows += [
        # value-level corruption, vector present (pre-r7 rows)
        dict(vec_id=em + 1, embedding=[0.0] * dim, label=0),          # zero-norm
        dict(vec_id=em + 2, embedding=[math.nan] * dim, label=1),     # NaN
        dict(vec_id=em + 3, embedding=[1e30] * dim, label=2),         # overflow
        dict(vec_id=em + 4, embedding=[-1e-30] * dim, label=None),    # denormal
        dict(erows[0], embedding=[9.9] * dim),                        # dup key
        # structural corruption (r7 rows; BLAS/LSH kernel coverage
        # restored to the main gate by the r9 cleanvec fix)
        dict(vec_id=None, embedding=[0.1] * dim, label=0),            # null key
        dict(vec_id=em + 5, embedding=None, label=0),                 # NULL vector
        dict(vec_id=em + 6, embedding=[0.5, 0.5, 0.5], label=0),      # ragged
        dict(vec_id=em + 7, embedding=[], label=1),                   # zero-length
        # NULL vector at the LOWEST id (r9, ADVICE r7): seed-from-lowest-
        # ids trainers (lloyd, PQ codebooks) and vec_id<N query windows
        # must drop it, not die collecting it (the pinned lloyd TypeError)
        dict(vec_id=-1, embedding=None, label=0),                     # low-id NULL
        # low-id RAGGED row (r9 review): a wrong-dimension vector among
        # the lowest ids must not silently poison seeded centroids /
        # PQ codewords (dim-pinned valid_vec), nor crash any query window
        dict(vec_id=-2, embedding=[0.5, 0.5, 0.5], label=0),          # low-id ragged
        # NULL-ELEMENT vector (r9 review): arrives as None from collect()
        # (TypeError hazard on the driver) and as NaN from Arrow (finite
        # mask in kernels); MLlib fit dies on it without valid_vec
        dict(vec_id=-3,
             embedding=[0.1] * (dim // 2) + [None] + [0.1] * (dim - dim // 2 - 1),
             label=0),                                                # null element
    ]
    pq.write_table(pa.Table.from_pylist(erows, schema=e.schema),
                   f"{dst}/embeddings.parquet")

    ev = con.execute(
        f"SELECT * FROM '{SRC}/events.parquet' LIMIT 2000"
    ).fetch_arrow_table()
    evrows = ev.to_pylist()
    evm = max(r["event_id"] for r in evrows)
    t0 = evrows[0]["ts"]
    evrows += [
        dict(event_id=evm + 1, ts=t0, user_id=None, event_type=None,
             value=None, props=None),
        dict(event_id=evm + 2, ts=t0, user_id=1, event_type="purchase",
             value=math.nan, props="not json {"),
        dict(event_id=evm + 3, ts=t0, user_id=2, event_type="",
             value=-1e9, props="{}"),
        dict(event_id=evm + 4, ts=None, user_id=5, event_type="view",
             value=1.0, props="{}"),                                  # null ts
        dict(event_id=None, ts=t0, user_id=6, event_type="view",
             value=1.0, props="{}"),                                  # null key
        dict(evrows[0]),                                              # dup event
    ]
    pq.write_table(pa.Table.from_pylist(evrows, schema=ev.schema),
                   f"{dst}/events.parquet")
    con.close()
    return str(dst)


def test_all_entries_survive_dirty_mirror(spark, dirty_dir):
    # no exemptions: the r7 BLAS/LSH deferral (and its pre-r7 variant
    # mirror) ended with the r9 cleanvec fix — every entry runs against
    # the FULL dirty row set, structural corruption included
    failures = {}
    for name, q in REGISTRY.items():
        try:
            q.spark(spark, dirty_dir).collect()
        except Exception as e:  # noqa: BLE001 — any crash is the finding
            failures[name] = f"{type(e).__name__}: {str(e)[:200]}"
    assert not failures, (
        f"{len(failures)} entries die on dirty rows (a malformed row must "
        f"fail the row, not the job): {failures}"
    )


def test_no_nan_or_inf_leaks_into_any_output(spark, dirty_dir):
    """Stronger than no-crash: on dirty inputs, no entry may EMIT a
    non-finite double — a NaN/Inf in an output column is the silent
    wrong-value failure class (NaN wins desc rankings, poisons sums)
    that the r9 hardening targeted. Malformed rows must be dropped or
    NULLed, never laundered into garbage numbers."""
    import math

    leaks = {}
    for name, q in REGISTRY.items():
        try:
            rows = q.spark(spark, dirty_dir).collect()
        except Exception:  # noqa: BLE001 — crashes are the other test's job
            continue
        for r in rows:
            for k, v in r.asDict(recursive=False).items():
                if isinstance(v, float) and not math.isfinite(v):
                    leaks.setdefault(name, set()).add(k)
    leaks = {n: sorted(cols) for n, cols in leaks.items()}
    assert not leaks, (
        f"{len(leaks)} entries emit non-finite doubles on dirty rows "
        f"(silent wrong-value leak): {leaks}"
    )
