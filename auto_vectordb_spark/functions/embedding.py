"""Batch embedding stage (reference V1 — Ollama bge-m3, one HTTP call per
page/query, /root/reference/backend/process/parsing.py:49,95-96,113).

Spark-first shape: an Arrow-batched ``pandas_udf`` so the model (or HTTP
client) is initialized once per executor and fed whole batches — the
reference's per-page HTTP call becomes partition-batched inference, the
single biggest throughput win of the port (SURVEY §3.1).

Backends are pluggable; the default is a *deterministic hash-projection
embedder* (no model weights in this container): token 60-bit hashes are
folded into ``dim`` buckets with signed weights, then L2-normalized. It is
content-sensitive, language-agnostic, reproducible across runs/engines — the
right stand-in for tests and for the driver's correctness gate. A production
deployment registers e.g. a sentence-transformers ONNX session with the same
signature.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

EmbedFn = Callable[[list[str]], "np.ndarray"]  # batch of texts → (n, dim) array

_BACKENDS: dict[str, Callable[[int], EmbedFn]] = {}


def register_backend(name: str, factory: Callable[[int], EmbedFn]) -> None:
    _BACKENDS[name] = factory


def hash_projection_embedder(dim: int) -> EmbedFn:
    """Deterministic test/CI embedder: signed token-hash folding, L2-normed.

    Uses the engine's portable 60-bit MD5 hash (functions/hashing.py
    ``stable_hash60`` semantics: first 15 hex chars, sign = bit 59) so the
    whole embedding stage has an exact DuckDB oracle twin
    (plans/parity.py ``embed_documents``).
    """

    def embed(texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), dim), dtype=np.float64)
        for i, text in enumerate(texts):
            for tok in str(text or "").lower().split():
                h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
                bucket = h % dim
                sign = 1.0 if (h >> 59) & 1 else -1.0
                out[i, bucket] += sign
            n = math.sqrt(float((out[i] ** 2).sum()))
            if n > 0:
                out[i] /= n
        return out.astype(np.float32)

    return embed


register_backend("hash", hash_projection_embedder)


def parse_legacy_embedding(col: Column) -> Column:
    """F10 — legacy TEXT-stored embeddings ``'{-0.07,0.01,...}'`` →
    ``array<float>``.

    The reference persists embeddings as a string in Postgres and re-parses
    them on the way to ES (strip braces, split on commas, float() each —
    /root/reference/backend/process/elasticsearch_index.py:84-111), returning
    [] when the value is malformed. Same contract here, as pure column
    expressions: any element that fails the float cast degrades the WHOLE
    value to an empty array (per-row failure isolation — a bad row never
    fails the job). Native ArrayType storage makes this a migration shim
    only.
    """
    trimmed = F.regexp_replace(col, r"^\{|\}$", "")
    parts = F.filter(F.split(trimmed, ","), lambda x: x != "")
    # try_cast, not cast: ANSI mode (Spark 4 default) makes a failed string
    # cast throw; the F10 contract degrades the row to [] instead
    floats = F.transform(parts, lambda x: x.try_cast("float"))
    return F.when(
        col.isNull() | F.exists(floats, lambda x: x.isNull()),
        F.array().cast("array<float>"),
    ).otherwise(floats)


def embed_udf(dim: int = 1024, backend: str = "hash") -> Column:
    """Returns a pandas_udf column fn: text → array<float>[dim].

    The backend is constructed lazily inside the UDF (once per python worker,
    not per row) — the pattern a real model backend needs for GPU/session
    reuse.
    """
    factory = _BACKENDS[backend]

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        fn = factory(dim)  # per-worker init (model load / HTTP session)
        for s in it:
            mat = fn(s.tolist())
            yield pd.Series(list(mat))

    return _embed
