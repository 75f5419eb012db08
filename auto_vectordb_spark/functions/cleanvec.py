"""Embedding-column hygiene for numpy/Arrow kernels (row-fails-not-job).

At 100 TB an embeddings shard WILL contain NULL vectors, zero-length
arrays, ragged dimensionalities (schema drift across ingest epochs), and
NULL ids (retry half-writes). The pure-DataFrame kernels absorb these for
free (NULL-propagating expressions), but the BLAS-shaped kernels call
``np.stack`` / ``astype(int64)``, which turn one malformed row into a dead
partition task — the round-7 empty/dirty-mirror findings. These helpers
centralize the contract those kernels share:

- a **probe** that determines the working dimensionality from a bounded
  sample of VALID rows (modal size, so one ragged minority row in the
  probe window cannot hijack the dimension), returning ``None`` on an
  empty/all-NULL column so builders can return the schema-correct empty
  frame instead of crashing;
- a **batch cleaner** that masks NULL-id / NULL-vector / wrong-dimension
  rows out of a pandas batch before ``np.stack`` — the malformed rows
  contribute nothing, the task lives.

Kept separate from functions/vector.py (frozen column-expression surface,
see SCALE.md): these are kernel-side utilities, not SQL-facing functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def valid_vec(col, dim: int | None = None):
    """Column predicate for a usable vector: present, non-empty, no NULL
    elements (one NULL element NULLs/poisons every downstream reduction,
    and MLlib fit/transform dies on it outright), and exactly ``dim`` long
    when given — the shared seed-scan / index-build row filter, so the
    contract has ONE spelling instead of drifting per call site."""
    c = F.col(col) if isinstance(col, str) else col
    p = c.isNotNull() & (F.size(c) > 0) & ~F.exists(c, lambda x: x.isNull())
    if dim is not None:
        p = p & (F.size(c) == int(dim))
    return p


def modal_dim(values) -> int | None:
    """Modal length of the non-NULL, non-empty vectors in ``values``
    (any iterable of list/None); ties prefer the larger dimension.
    ``None`` when no valid vector exists."""
    sizes: list[int] = []
    for v in values:
        if v is not None and len(v) > 0:
            sizes.append(len(v))
    if not sizes:
        return None
    return max(set(sizes), key=lambda d: (sizes.count(d), d))


def probe_dim(df: DataFrame, vec_col: str, sample: int = 64) -> int | None:
    """Working dimensionality of ``df[vec_col]`` from the first ``sample``
    valid rows (bounded collect — scale-safe). ``None`` on an empty or
    all-invalid column."""
    rows = (
        df.select(F.size(F.col(vec_col)).alias("d"))
        .where(F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0))
        .limit(sample)
        .collect()
    )
    sizes = [r["d"] for r in rows]
    if not sizes:
        return None
    return max(set(sizes), key=lambda d: (sizes.count(d), d))


def clean_rows(rows, vec_field: str, dim: int, id_field: str | None = None) -> list:
    """Driver-side twin of :func:`clean_block` for collected Row lists:
    keep rows with a non-NULL, all-finite ``dim``-length vector (and
    non-NULL id when ``id_field`` is given). NULL elements arrive as
    Python ``None`` from collect() (the kernels see them as NaN after
    Arrow conversion) — they must drop the row, not TypeError the
    driver."""
    import math

    out = []
    for r in rows:
        v = r[vec_field]
        if (
            v is None
            or len(v) != dim
            or any(x is None or not math.isfinite(x) for x in v)
        ):
            continue
        if id_field is not None and r[id_field] is None:
            continue
        out.append(r)
    return out


def clean_block(pdf, vec_col: str, dim: int, id_col: str | None = None):
    """(mask, matrix) for one pandas batch: ``mask`` is the boolean row
    filter (vector present, exactly ``dim`` long, all elements FINITE, id
    present when ``id_col`` given — a NULL long id arrives as NaN after
    Arrow conversion) and ``matrix`` is the float64 ``np.stack`` of the
    surviving vectors, or ``None`` when nothing survives.

    The finite requirement mirrors vector.cosine's nan_to_null doctrine:
    a NaN element would flow through the GEMM into NaN scores, which the
    expression kernels map to NULL but a numpy/Spark desc ranking would
    order FIRST — one NaN embedding silently winning a top-k is the
    wrong-value failure mode, worse than a crash."""
    import numpy as np
    import pandas as pd

    vals = pdf[vec_col].to_numpy(dtype=object)
    mask = np.fromiter(
        (v is not None and len(v) == dim for v in vals), dtype=bool, count=len(vals)
    )
    if id_col is not None:
        mask &= pd.notna(pdf[id_col]).to_numpy()
    if not mask.any():
        return mask, None
    M = np.stack([np.asarray(v, dtype=np.float64) for v in vals[mask]])
    finite = np.isfinite(M).all(axis=1)
    if not finite.all():
        mask[np.flatnonzero(mask)[~finite]] = False
        if not mask.any():
            return mask, None
        M = M[finite]
    return mask, M
