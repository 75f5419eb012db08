"""Empty-mirror gate: every registry entry must survive ZERO-ROW tables.

The dirty mirror (test_dirty_mirror.py) covers MALFORMED rows; this gate
covers ABSENT rows — at 100 TB an empty slice is routine (a source with no
documents today, an events partition with no rows for an hour, an
embeddings shard that filtered to nothing). A distributed job over an
empty slice must produce an empty (or well-defined degenerate) result —
never an analysis-time crash on array_min(array()) over zero trained
centroids, an IndexError on rows[0] of an empty codebook sample, or an
opaque MLlib fit failure. First run of this gate (round 7) found 14
entries dying on empty input; 9 were fixed (cluster/PQ empty-quantizer
guards, loud typed error + entry-level degrade for the classifier) and 5
are documented deferrals below.

Policy mirror of the dirty gate: zero exceptions outside the deferred
set; row counts are free (they will be 0).
"""

import sys

import pytest

from auto_vectordb_spark.plans.parity import REGISTRY

sys.path.insert(0, "/root/repo/tools")
from empty_probe import make_empty_dir  # noqa: E402

# Known empty-input crashers, deferred to the post-backlog round because
# the fixes edit operators/knn.py (+5 fresh attestations staled) and
# operators/dedup.py (+4) — over the round-7/8 re-attestation window
# budget (see SCALE.md "Empty-input contract"). Each dies in a numpy
# stack / Spark-ML fit over an empty corpus sample:
DEFERRED_EMPTY_CRASHERS = {
    "ann_lsh_topk",               # BucketedRandomProjectionLSH.fit on empty
    "knn_blas_topk",              # np.stack([]) in the Arrow kernel
    "dedup_embedding_blas",       # first() -> None subscript
    "dedup_embedding_blas_exact", # np.stack([]) in the Arrow kernel
    "dedup_embedding_lsh",        # first() -> None subscript
}


# rows=0: the empty slice. rows=1: the TINY slice — same contract, but a
# different crash surface (k-greater-than-n training seeds, ANSI
# INVALID_ARRAY_INDEX on second-nearest lookups, single-row window
# frames); first run found lloyd's centroid update indexing range(k)
# over n<k seeds. The deferred set only crashes at rows=0 (their numpy/
# ML kernels are fine with one row), so it is exempted there only.
@pytest.fixture(scope="module", params=[0, 1], ids=["empty", "one-row"])
def mirror_dir(request, tmp_path_factory):
    dst = tmp_path_factory.mktemp(f"mirror_sf_{request.param}")
    make_empty_dir(str(dst), rows=request.param)
    return request.param, str(dst)


def test_all_entries_survive_empty_and_tiny_tables(spark, mirror_dir):
    rows, path = mirror_dir
    failures = {}
    for name, q in REGISTRY.items():
        if rows == 0 and name in DEFERRED_EMPTY_CRASHERS:
            continue
        try:
            q.spark(spark, path).collect()
        except Exception as e:  # noqa: BLE001 — any crash is the finding
            failures[name] = f"{type(e).__name__}: {str(e)[:200]}"
    assert not failures, (
        f"{len(failures)} entries die on {rows}-row tables (an empty/tiny "
        f"slice must yield a degenerate result, not kill the job): {failures}"
    )


def test_deferred_crashers_still_crash_on_empty(spark, mirror_dir):
    """Canary on the deferral list itself: every DEFERRED entry must still
    actually crash on the empty slice. When the budgeted fix lands (r9),
    this fails on the fixed entry, forcing its removal from
    DEFERRED_EMPTY_CRASHERS so it re-enters the main gate — the exemption
    can never silently outlive the defect it documents."""
    rows, path = mirror_dir
    if rows != 0:
        pytest.skip("the deferred kernels only crash on the 0-row slice")
    healed = []
    for name in sorted(DEFERRED_EMPTY_CRASHERS):
        try:
            REGISTRY[name].spark(spark, path).collect()
            healed.append(name)
        except Exception:  # noqa: BLE001 — crash is the (current) contract
            pass
    assert not healed, (
        f"entries no longer crash on empty input — remove them from "
        f"DEFERRED_EMPTY_CRASHERS so the main gate covers them: {healed}"
    )
