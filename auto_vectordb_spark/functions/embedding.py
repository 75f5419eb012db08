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


def random_projection_embedder(dim: int, input_dim: int = 4096, seed: int = 7) -> EmbedFn:
    """Second first-class backend: hashed bag-of-tokens → fixed random
    Gaussian projection → L2 norm (the classic random-projection text
    embedder).

    Unlike ``hash``, this backend has *model-like* mechanics: a weight
    matrix is materialized once per worker (the per-worker init path a real
    ONNX/sentence-transformers session uses) and inference is a matmul over
    the whole Arrow batch. It exists to prove the backend seam end-to-end
    with a genuinely different implementation — see
    tests/test_pipeline.py::test_embed_backend_seam.
    """

    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((input_dim, dim)).astype(np.float32) / math.sqrt(dim)

    def embed(texts: list[str]) -> np.ndarray:
        bow = np.zeros((len(texts), input_dim), dtype=np.float32)
        for i, text in enumerate(texts):
            for tok in str(text or "").lower().split():
                h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
                bow[i, h % input_dim] += 1.0 if (h >> 59) & 1 else -1.0
        out = bow @ proj  # one matmul per Arrow batch
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        np.divide(out, norms, out=out, where=norms > 0)
        return out

    return embed


register_backend("randproj", random_projection_embedder)


def sentence_transformers_embedder(dim: int, model: str = "BAAI/bge-m3") -> EmbedFn:
    """Production backend slot: the reference's actual model (bge-m3,
    /root/reference/backend/process/parsing.py:49) via sentence-transformers.

    The library (and its weights) are not bundled in this container, so the
    factory raises ImportError at *construction* time when absent — the
    registry entry below is only added when the import succeeds, and
    tests/test_pipeline.py gates its test with importorskip. When present,
    the session loads once per python worker (the ``embed_udf`` lazy-init
    contract) and encodes whole Arrow batches.
    """
    from sentence_transformers import SentenceTransformer

    session = SentenceTransformer(model)

    def embed(texts: list[str]) -> np.ndarray:
        vecs = session.encode(
            [str(t or "") for t in texts], normalize_embeddings=True, convert_to_numpy=True
        )
        if vecs.shape[1] != dim:
            raise ValueError(f"model dim {vecs.shape[1]} != requested {dim}")
        return vecs.astype(np.float32)

    return embed


try:  # register the real-model backend only where the library exists
    import sentence_transformers  # noqa: F401

    register_backend("bge-m3", sentence_transformers_embedder)
except ImportError:
    pass


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
