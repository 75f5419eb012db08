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
    # pre-r7 dirty embedding rows: value-level corruption, vector present
    erows_pre_r7 = erows + [
        dict(vec_id=em + 1, embedding=[0.0] * dim, label=0),          # zero-norm
        dict(vec_id=em + 2, embedding=[math.nan] * dim, label=1),     # NaN
        dict(vec_id=em + 3, embedding=[1e30] * dim, label=2),         # overflow
        dict(vec_id=em + 4, embedding=[-1e-30] * dim, label=None),    # denormal
        dict(erows[0], embedding=[9.9] * dim),                        # dup key
    ]
    # r7 structural rows: the ones the deferred BLAS/LSH kernels still
    # crash on (np.stack of None/ragged) — main mirror only
    erows_full = erows_pre_r7 + [
        dict(vec_id=None, embedding=[0.1] * dim, label=0),            # null key
        dict(vec_id=em + 5, embedding=None, label=0),                 # NULL vector
        dict(vec_id=em + 6, embedding=[0.5, 0.5, 0.5], label=0),      # ragged
        dict(vec_id=em + 7, embedding=[], label=1),                   # zero-length
    ]
    pq.write_table(pa.Table.from_pylist(erows_full, schema=e.schema),
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

    # Variant mirror for the DEFERRED_EMPTY_CRASHERS: identical except the
    # embeddings table stops at the pre-r7 dirty rows. Skipping those five
    # entries from the whole gate (r7) silently dropped their
    # previously-passing NaN/overflow/unicode/null-text coverage — this
    # dir restores it while the structural NULL/ragged fix waits on the
    # r9 engine-edit budget (ADVICE r7).
    import os

    dst2 = tmp_path_factory.mktemp("dirty_sf_pre_r7")
    for t in TABLES:
        if t != "embeddings":
            os.symlink(f"{dst}/{t}.parquet", f"{dst2}/{t}.parquet")
    pq.write_table(pa.Table.from_pylist(erows_pre_r7, schema=e.schema),
                   f"{dst2}/embeddings.parquet")
    return str(dst), str(dst2)


def test_all_entries_survive_dirty_mirror(spark, dirty_dir):
    # the BLAS/LSH numpy kernels also die on the r7 NULL-vector row, the
    # same file-edit-budget deferral as the empty gate (SCALE.md
    # "Empty-input contract") — exempted here until those land
    from test_empty_mirror import DEFERRED_EMPTY_CRASHERS

    failures = {}
    for name, q in REGISTRY.items():
        if name in DEFERRED_EMPTY_CRASHERS:
            continue
        try:
            q.spark(spark, dirty_dir[0]).collect()
        except Exception as e:  # noqa: BLE001 — any crash is the finding
            failures[name] = f"{type(e).__name__}: {str(e)[:200]}"
    assert not failures, (
        f"{len(failures)} entries die on dirty rows (a malformed row must "
        f"fail the row, not the job): {failures}"
    )


def test_deferred_entries_survive_pre_r7_dirty_rows(spark, dirty_dir):
    """The five deferred kernels keep their pre-r7 dirty coverage: NaN /
    overflow / denormal / zero-norm / dup-key embeddings plus every
    document- and event-side corruption must still fail the row, not the
    job. Only the r7 structural rows (NULL/ragged/zero-length vectors,
    NULL vec_id) are out of scope until the r9 fix."""
    from test_empty_mirror import DEFERRED_EMPTY_CRASHERS

    failures = {}
    for name in DEFERRED_EMPTY_CRASHERS:
        try:
            REGISTRY[name].spark(spark, dirty_dir[1]).collect()
        except Exception as e:  # noqa: BLE001 — any crash is the finding
            failures[name] = f"{type(e).__name__}: {str(e)[:200]}"
    assert not failures, (
        f"deferred entries regressed on PRE-r7 dirty rows (this coverage "
        f"passed before the r7 skip): {failures}"
    )
