"""End-to-end pipeline facade — the reference's API surface as one class.

The reference exposes its lifecycle over FastAPI endpoints backed by four
stores (SURVEY §3): upload (routers/upload.py) → parse+embed
(process/parsing.py) → relational store (process/postgres.py) → search index
(process/elasticsearch_index.py) → hybrid search (routers/es_index.py).
:class:`VectorPipeline` mirrors that surface 1:1 on Spark — one parquet
corpus replaces Postgres/MariaDB/pickle, derived DataFrames replace the ES
index, and every stage is a DataFrame→DataFrame transform, so the whole
chain is lazily planned and Catalyst-optimized end to end.

Endpoint ↔ method map (reference file:line → here):

- POST /upload, /upload_chunk (routers/upload.py:13-105) → :meth:`stage_files`
  (driver-side copy to the staging dir; chunked HTTP transport is replaced by
  the distributed FS's own multipart semantics)
- POST /batch_parse_by_folder (routers/parser.py:54-86 →
  process/parsing.py:245-289) → :meth:`parse` (binaryFile scan +
  mapInPandas page parser; Docling/OCR is an environment-heavy library —
  pluggable ``parser`` with a deterministic text fake for tests, see
  :data:`PARSERS`)
- embedding at parse time (parsing.py:113,95-96; Ollama bge-m3 per page) →
  :meth:`embed` (Arrow-batched pandas_udf, functions/embedding.py)
- POST /insert_from_pickle (routers/pg_rdb.py:95-114) → :meth:`save_corpus`
- POST /index/document (routers/es_index.py:51-69 →
  process/elasticsearch_index.py:145-172) → :meth:`build_index`
  (idempotent by id, ES _id overwrite semantics)
- POST /search (routers/es_index.py:90-127 →
  process/elasticsearch_index.py:215-306) → :meth:`search` (hybrid weighted
  BM25×1.0 + cosine×0.8, minimum_should_match≥1, min_score, size bounds)
- GET /unique-filepath/{table} (routers/pg_rdb.py:142-156) →
  :meth:`distinct_filepaths`
- documents by filepath (process/postgres.py:321-341; ES term query
  elasticsearch_index.py:174-211) → :meth:`get_by_hashed_filepath`
- DELETE row (process/postgres.py:365-400) → :meth:`delete_by_ids`
- table DDL/list (process/postgres.py:40-146) → catalog.py (not duplicated
  here)

Scale design: the corpus is written partitioned by ``lv1_cat`` (partition
pruning for category-scoped search); BM25 postings shuffle once at build;
query-time plans only broadcast-join query-sized tables against them.
"""

from __future__ import annotations

import shutil
from collections.abc import Callable, Iterator
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions.embedding import embed_udf
from .functions.text import (
    category_levels,
    context_prefix,
    md5_hex,
    normalize_newlines,
    normalize_path,
    strip_image_tags,
)
from .operators import bm25 as BM25
from .operators import hybrid as HY
from .operators import knn as KNN
from .operators.relational import delete_by_ids as _delete_by_ids

# A parser maps (filepath, raw bytes) → [(page_number, page_markdown), ...].
ParserFn = Callable[[str, bytes], list[tuple[int, str]]]

PAGE_CHARS = 2000  # fake-parser page size (reference pages are real PDF pages)


def text_page_parser(path: str, content: bytes) -> list[tuple[int, str]]:
    """Deterministic stand-in parser: UTF-8 text, form-feed or fixed-size pages.

    Replaces Docling+EasyOCR (reference parsing.py:61-73,196-198) which is not
    bundled in this container. Splits on form-feed if present, else into
    PAGE_CHARS-char pages — page numbering starts at 0 like the reference's
    enumerate (parsing.py:206).
    """
    text = content.decode("utf-8", errors="replace")
    if "\f" in text:
        pages = text.split("\f")
    else:
        pages = [text[i : i + PAGE_CHARS] for i in range(0, max(len(text), 1), PAGE_CHARS)]
    return list(enumerate(pages))


def docling_pdf_parser(path: str, content: bytes) -> list[tuple[int, str]]:
    """Real PDF parser slot (reference parsing.py:171-218). Docling/EasyOCR are
    not installed in this container — register the real implementation here in
    a production image; the Spark-side plumbing (binary scan, mapInPandas
    signature, page explosion, downstream transforms) is identical."""
    try:
        from docling.document_converter import DocumentConverter  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "docling is not available in this environment; use parser='text' "
            "or register a custom parser in PARSERS"
        ) from e
    raise NotImplementedError("wire DocumentConverter per reference parsing.py:171-218")


PARSERS: dict[str, ParserFn] = {"text": text_page_parser, "pdf": docling_pdf_parser}

_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("filepath", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("page_content", T.StringType()),
        T.StructField("error", T.StringType()),
        T.StructField("status", T.StringType()),
    ]
)


class VectorPipeline:
    """Spark-first re-expression of the reference's document→search pipeline.

    ``base_path``: directory for the corpus parquet; ``dim``: embedding width
    (reference: 1024, bge-m3); ``upload_root``: path segment after which
    category levels are derived (reference 'uploaded/', parsing.py:266-276).
    """

    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        dim: int = 1024,
        embed_backend: str = "hash",
        upload_root: str = "uploaded/",
    ) -> None:
        self.spark = spark
        self.base = Path(base_path)
        self.dim = dim
        self.embed_backend = embed_backend
        self.upload_root = upload_root
        self._bm25: BM25.BM25Index | None = None
        self._corpus_cache: DataFrame | None = None

    # ---- staging (S1/S2) --------------------------------------------------

    def stage_files(self, local_paths: list[str], server_path: str = "") -> list[str]:
        """Upload-endpoint analog: copy files into the staging area.

        The reference streams 10 MB HTTP chunks (frontend/app.py:145-170) and
        has an overwrite-not-append bug (routers/upload.py:87-90, SURVEY
        §2.11) — on a distributed FS a plain copy (or S3 multipart) subsumes
        both. Driver-side by design: no data plane work happens here.
        """
        dest_dir = self.base / "uploaded" / server_path
        dest_dir.mkdir(parents=True, exist_ok=True)
        out = []
        for p in local_paths:
            dest = dest_dir / Path(p).name
            shutil.copyfile(p, dest)
            out.append(str(dest))
        return out

    def clear_staging(self, path: str | None = None) -> None:
        """S17 — staging cleanup (reference ``_clear_folder``,
        /root/reference/backend/process/parsing.py:157-169): delete every
        file and subfolder *inside* the staging dir but keep the dir itself;
        raise if the dir does not exist (same contract).

        Driver-side fs op by design (SURVEY maps S17 to "not a Spark
        operator") — exposed here for endpoint parity with the reference's
        ``remove_original`` flow (parsing.py:286-287).
        """
        target = Path(path) if path is not None else self.base / "uploaded"
        if not target.exists():
            raise FileNotFoundError(f"staging folder does not exist: {target}")
        for item in target.iterdir():
            if item.is_file() or item.is_symlink():
                item.unlink()
            else:
                shutil.rmtree(item)

    # ---- parse (S3–S7, F1–F8) --------------------------------------------

    def parse(self, path: str | None = None, parser: str | ParserFn = "text") -> DataFrame:
        """binaryFile scan → per-partition page parsing → canonical chunks.

        1 file row → N page rows via mapInPandas (the reference's per-file
        Docling loop, parsing.py:245-289, made embarrassingly parallel).
        Parse failures become (error, status='failed') rows instead of
        aborting the batch — reference semantics (parsing.py:137-155) minus
        its NameError bug (SURVEY §2.11).
        """
        src = str(self.base / "uploaded") if path is None else path
        files = (
            self.spark.read.format("binaryFile")
            .option("recursiveFileLookup", "true")
            .load(src)
            .select("path", "content")
        )
        return self.parse_files_df(files, parser)

    def parse_files_df(
        self, files: DataFrame, parser: str | ParserFn = "text"
    ) -> DataFrame:
        """Parse a (path, content) DataFrame — the scan-free core of
        :meth:`parse` (also the driver-oracle entry point, no FS needed)."""
        parse_fn = PARSERS[parser] if isinstance(parser, str) else parser

        def run(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                rows = []
                for path_, content in zip(pdf["path"], pdf["content"]):
                    try:
                        for pageno, text in parse_fn(path_, bytes(content)):
                            rows.append(
                                {
                                    "filepath": path_,
                                    "page": pageno,
                                    "page_content": text,
                                    "error": None,
                                    "status": "success",
                                }
                            )
                    except Exception as e:  # error-row semantics, not abort
                        rows.append(
                            {
                                "filepath": path_,
                                "page": -1,
                                "page_content": None,
                                "error": str(e),
                                "status": "failed",
                            }
                        )
                yield pd.DataFrame(rows, columns=[f.name for f in _PAGES_SCHEMA.fields])

        pages = files.mapInPandas(run, schema=_PAGES_SCHEMA)
        return self._pages_to_chunks(pages)

    def _pages_to_chunks(self, pages: DataFrame) -> DataFrame:
        """F1–F8 transform stack over (filepath, page, page_content) rows."""
        path = normalize_path(F.col("filepath"))
        # strip URI scheme binaryFile adds (file:/...), keep reference-shaped paths
        path = F.regexp_replace(path, r"^[a-z]+:/+", "/")
        filename = F.element_at(F.split(path, "/"), -1)
        stem = F.regexp_replace(filename, r"\.[^.]*$", "")
        cleaned = normalize_newlines(strip_image_tags(F.col("page_content")))
        cats = category_levels(path, self.upload_root)
        cats_str = F.concat_ws(
            ", ", *[F.when(c != "", c) for c in cats]
        )  # nulls dropped by concat_ws
        content = context_prefix(cleaned, stem, cats_str)
        return pages.select(
            md5_hex(F.concat_ws("#", path, F.col("page").cast("string"))).alias("id"),
            F.when(F.col("status") == "success", content).alias("page_content"),
            filename.alias("filename"),
            path.alias("filepath"),
            md5_hex(filename).alias("hashed_filename"),
            md5_hex(path).alias("hashed_filepath"),
            md5_hex(content).alias("hashed_page_content"),
            F.col("page").cast("string").alias("page"),
            *cats,
            F.lit(None).cast("array<float>").alias("embeddings"),
            F.current_timestamp().alias("created_at"),
            F.current_timestamp().alias("updated_at"),
            "error",
            "status",
        )

    # ---- embed (V1) -------------------------------------------------------

    def embed(self, chunks: DataFrame, text_col: str = "page_content") -> DataFrame:
        """Fill ``embeddings`` with the batch embedder (V1). One Arrow batch
        per UDF call replaces the reference's one HTTP call per page."""
        return chunks.withColumn("embeddings", embed_udf(self.dim, self.embed_backend)(F.col(text_col)))

    def embed_texts(self, texts: list[str]) -> list[list[float]]:
        """Query-side embedding (routers/es_index.py:105) — same backend."""
        from .functions.embedding import _BACKENDS

        return [list(map(float, v)) for v in _BACKENDS[self.embed_backend](self.dim)(texts)]

    # ---- persist + index (S10, S11) ---------------------------------------

    def save_corpus(
        self, chunks: DataFrame, mode: str = "append", remove_original: bool = False
    ) -> None:
        """Write the corpus parquet partitioned by lv1_cat (partition pruning
        for category-scoped reads; the reference's Postgres insert S10).

        ``remove_original`` mirrors the reference's post-parse staging wipe
        (parsing.py:286-287) — gated HERE, after the write action has
        materialized the chunks, because the lazy ``parse`` plan re-reads the
        staged files; clearing before the action would read deleted inputs.
        """
        ok = chunks.filter(F.col("status") == "success").drop("error", "status")
        ok.write.mode(mode).partitionBy("lv1_cat").parquet(str(self.base / "corpus"))
        self._corpus_cache = None
        self._bm25 = None
        if remove_original:
            self.clear_staging()

    def corpus(self) -> DataFrame:
        if self._corpus_cache is None:
            df = self.spark.read.parquet(str(self.base / "corpus"))
            # Empty-string categories round-trip through partitionBy as the
            # Hive default partition (null; VOID-typed when ALL rows are
            # uncategorized) — restore the reference's '' default and a
            # string type so a later partitioned rewrite is always legal.
            self._corpus_cache = df.withColumn(
                "lv1_cat", F.coalesce(F.col("lv1_cat").cast("string"), F.lit(""))
            )
        return self._corpus_cache

    def build_index(self) -> None:
        """S11 — derive the search-index artifacts from the corpus: BM25
        postings/stats (cached DataFrames). Idempotent by id
        (dropDuplicates = ES _id overwrite, elasticsearch_index.py:141)."""
        docs = self.corpus().dropDuplicates(["id"]).select(
            F.col("id").alias("doc_id"), F.col("page_content").alias("text")
        )
        self._bm25 = BM25.build_index(docs, "doc_id", "text", cache=True)

    # ---- search (V2–V5, P5, P6) -------------------------------------------

    def search(
        self,
        query_text: str,
        size: int = 10,
        min_score: float = 0.0,
        mode: str = "hybrid",
        categories: list[str] | None = None,
    ) -> DataFrame:
        """Hybrid top-k search — the reference's POST /search.

        Weighted fusion bm25*1.0 + cosine*0.8 over the union of both legs
        (minimum_should_match: 1), min_score cut, size clamped to the API
        bounds 1..100 (routers/es_index.py:45-46). Returns hits joined back
        to corpus columns (V5 — hits are already columnar here).

        ``categories`` restricts the kNN leg to the given ``lv1_cat`` values —
        since the corpus is WRITTEN partitioned by lv1_cat, this filter is a
        partition-pruned scan (whole directories skipped, verified in
        tests), not a row filter.
        """
        size = max(1, min(int(size), 100))
        if self._bm25 is None:
            self.build_index()
        qvec = self.embed_texts([query_text])[0]
        if len(qvec) != self.dim:  # P6 dimension guard (es_index.py:107-111)
            raise ValueError(f"query embedding dim {len(qvec)} != {self.dim}")
        corpus = self.corpus().dropDuplicates(["id"])
        if categories is not None:
            corpus = corpus.filter(F.col("lv1_cat").isin(list(categories)))
        queries_df = self.spark.createDataFrame(
            [(0, query_text)], ["query_id", "query_text"]
        )
        qvec_df = self.spark.createDataFrame(
            [(0, qvec)], T.StructType([
                T.StructField("query_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]),
        )
        knn_scores = KNN.score_pairs(
            qvec_df, corpus.select(F.col("id").alias("doc_id"), F.col("embeddings")),
            corpus_vec="embeddings",
        ).select("query_id", "doc_id", "score")
        bm25_scores = BM25.search(self._bm25, queries_df, k=max(size * 10, 50))
        if categories is not None:
            # the BM25 index is corpus-wide; restrict its leg too, or
            # out-of-category docs would occupy top-k slots pre-join
            bm25_scores = bm25_scores.join(
                corpus.select(F.col("id").alias("doc_id")), "doc_id", "left_semi"
            )
        if mode == "hybrid":
            hits = HY.fuse_weighted(bm25_scores, knn_scores, min_score=min_score, k=size)
        elif mode == "bm25":
            hits = HY.fuse_weighted(bm25_scores, bm25_scores.limit(0), min_score=min_score, k=size)
        elif mode == "knn":
            hits = HY.fuse_weighted(
                knn_scores.limit(0), knn_scores, min_score=min_score, k=size
            )
        elif mode == "rerank":
            # two-stage: hybrid top-(4*size) candidates, reranked by the
            # pluggable second-stage scorer (token-overlap stand-in; a real
            # cross-encoder swaps in via operators/hybrid.py)
            cand = HY.fuse_weighted(
                bm25_scores, knn_scores, min_score=min_score, k=max(4 * size, 20)
            )
            hits = HY.rerank_token_overlap(
                cand,
                queries_df,
                corpus.select(F.col("id").alias("doc_id"), F.col("page_content")),
                k=size,
                text_col="page_content",
            ).select("query_id", "doc_id", F.col("rerank_score").alias("score"))
        else:
            raise ValueError(f"unknown mode {mode!r}")
        return (
            hits.join(corpus, hits["doc_id"] == corpus["id"])
            .drop("doc_id", "query_id")
            .orderBy(F.col("score").desc(), F.col("id").asc())
        )

    # ---- management (P1, P4, A1, A2) --------------------------------------

    def get_by_hashed_filepath(self, hashed_filepath: str) -> DataFrame:
        """P1/P2 — pushed-down equality scan."""
        return self.corpus().filter(F.col("hashed_filepath") == hashed_filepath)

    def distinct_filepaths(self) -> list[str]:
        """A1 — GET /unique-filepath (reference routers/pg_rdb.py:142-156).

        Faithful to the reference endpoint, which materializes the full list
        — a driver collect of one row per distinct file. At 100 M+ files
        that is a driver OOM by design; large deployments should use
        :meth:`distinct_filepaths_df` and keep the result distributed
        (write it, join it, or limit it)."""
        return [
            r["hashed_filepath"] for r in self.distinct_filepaths_df().collect()
        ]

    def distinct_filepaths_df(self) -> DataFrame:
        """A1, the scale path: distinct filepaths as a DataFrame (one
        short-key shuffle, nothing collected)."""
        return self.corpus().select("hashed_filepath").distinct()

    def delete_by_ids(self, ids: list[str]) -> None:
        """P4 — rewrite corpus minus ids (parquet has no in-place delete; on
        Delta this becomes ``DELETE FROM``). Overwrites atomically via a
        staging write then swap."""
        remaining = _delete_by_ids(self.corpus(), "id", ids)
        staging = self.base / "corpus_staging"
        remaining.write.mode("overwrite").partitionBy("lv1_cat").parquet(str(staging))
        final = self.base / "corpus"
        shutil.rmtree(final)
        staging.rename(final)
        self._corpus_cache = None
        self._bm25 = None

    def count(self) -> int:
        return self.corpus().count()


def build_training_set(
    docs: DataFrame,
    quality_min: float = 0.5,
    token_budget: int = 8_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The flagship LLM-data flow in ONE lineage: near-dup removal →
    quality filter → deterministic budget sampling.

    1. MinHash-LSH pairs → connected components → keep-one-per-cluster
       (operators/dedup.py; never N², iterative label propagation);
    2. quality_score ≥ ``quality_min`` (C4/Gopher-style cheap features);
    3. order survivors by md5(id) — a deterministic shuffle-proof
       pseudo-random permutation — and keep docs while the running token
       total fits ``token_budget``.

    Stage 3 is a **distributed two-level prefix sum**, not a global window
    (``Window.orderBy`` with no partition serializes the whole corpus
    through one task — the round-1 scale-killer):

    - bucket = first 2 hex chars of the md5 order key. Hex strings of equal
      length sort lexicographically = numerically, so the 256 buckets are
      *contiguous ranges* of the global order — deterministic, no
      repartitionByRange sampling, no spark_partition_id.
    - per-bucket token totals (a plain 256-row groupBy-sum, no window) are
      collected — a sanctioned 256-row scalar-class action that doubles as
      the cache-materializing pin for the persisted survivors — and their
      exclusive prefix sum returns as a 256-entry literal map lookup;
    - running sum *within* each bucket (windows parallelize across buckets)
      + the bucket's offset = the global running total.

    global cum = in-bucket cum + offset of all preceding buckets. Output is
    bit-identical to the single-window form (oracle-verified,
    plans/parity.py training_set_build).

    At 100 TB: stages 1-2 are the dedup/textstats operators at their
    documented shuffle budgets; stage 3 adds one hash shuffle on the bucket
    key plus a 256-row broadcast.

    Measured dead-end (don't retry): fanning the 1-partition survivors
    join output before quality_score/persist (dedup.fan_out_small_scan)
    is a wash — min-of-4 2.90 s as-is vs 3.01 s fanned for the
    front+persist segment at sf0.1/local[32]. The minhash front end
    inside the join lineage dominates and is already fanned; the
    single-core quality pass over the narrow survivor set costs less
    than the extra exchange.
    """
    from pyspark.sql.window import Window

    from .operators import dedup as DD
    from .operators import textstats as TS

    pairs = DD.minhash_lsh_pairs(docs, id_col, text_col)
    surviving = DD.apply_dedup(docs, pairs, id_col)
    # quality_score already emits n_tokens (same tokenize() as token_stats),
    # so stages 2+3's inputs come from ONE projection over the survivors. A
    # quality ⋈ token_stats self-join here would re-evaluate the entire
    # minhash-dedup front end on both sides plus shuffle on doc_id — measured
    # ~2 s extra at sf0.1 for identical output.
    ranked = (
        TS.quality_score(surviving, id_col, text_col)
        .filter(F.col("quality") >= quality_min)
        .select("doc_id", "quality", "n_tokens")
        .withColumn("__ord", F.md5(F.col("doc_id").cast("string")))
        .withColumn("__bkt", F.substring("__ord", 1, 2))
    )
    # The prefix-sum graph below is a diamond: the 256-row offsets branch AND
    # the main probe branch both descend from `ranked`, whose lineage contains
    # the whole minhash-dedup front end (the expensive part). The broadcast
    # boundary defeats ReusedExchange under AQE (measured: 2× front-end cost,
    # 6.2 s vs 4.4 s at sf0.1), so persist the survivors explicitly — a tiny
    # (id + 3 numeric cols) table even at 100 TB corpus scale.
    ranked = ranked.persist()
    # ONE action both materializes the cache (pinning the front end to
    # exactly one execution — a lazy persist lets the two branches race,
    # measured up to 17 s run-to-run at sf0.1) AND produces the offsets:
    # per-bucket totals are a plain groupBy-sum over the cached survivors —
    # no window — collected as ≤256 rows. This replaced a separate
    # count() pin + window-derived totals + broadcast self-join (the r2
    # shape): same output, one fewer job, no totals-side window sort.
    totals = ranked.groupBy("__bkt").agg(F.sum("n_tokens").alias("__tot")).collect()
    run = 0
    offsets: dict[str, int] = {}
    for r in sorted(totals, key=lambda r: r["__bkt"]):
        offsets[r["__bkt"]] = run
        run += r["__tot"]
    if not offsets:  # every doc deduped/filtered away: empty, typed result
        return ranked.select(
            "doc_id", "n_tokens", F.lit(0).cast("long").alias("cum_tokens"), "quality"
        ).limit(0)
    # 256-entry literal lookup beats a broadcast join: no broadcast
    # exchange, no join node, stays inside whole-stage codegen.
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    in_bucket = Window.partitionBy("__bkt").orderBy("__ord").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = (
        ranked.withColumn("__cum_local", F.sum("n_tokens").over(in_bucket))
        .withColumn("cum_tokens", F.col("__cum_local") + off_map[F.col("__bkt")])
        .filter(F.col("cum_tokens") <= token_budget)
        .select("doc_id", "n_tokens", "cum_tokens", "quality")
    )
    return out


def _ingest_stream_method(
    self,
    path: str | None = None,
    checkpoint: str | None = None,
    parser: str | ParserFn = "text",
    max_files_per_trigger: int | None = None,
):
    """Incremental ingest: files arriving under the staging dir stream
    through the SAME parse→embed→chunk lineage as batch (one code path,
    SURVEY §3.1) and append to the corpus via idempotent foreachBatch.

    Returns the StreamingQuery; callers own its lifecycle. Replays are safe:
    each micro-batch is deduped by id and the corpus read path dedupes again
    (ES _id overwrite semantics).
    """
    from .streaming.pipeline import foreach_batch_index_merge

    src = str(self.base / "uploaded") if path is None else path
    ckpt = checkpoint or str(self.base / "_ingest_ckpt")
    binary_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    files = (
        self.spark.readStream.format("binaryFile")
        .schema(binary_schema)  # streaming file sources require explicit schema
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        files = files.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = files.load(src).select("path", "content")
    chunks = self.embed(self.parse_files_df(stream, parser))

    def write_fn(batch: DataFrame, epoch: int) -> None:
        ok = batch.filter(F.col("status") == "success").drop("error", "status")
        if ok.take(1):
            ok.write.mode("append").partitionBy("lv1_cat").parquet(
                str(self.base / "corpus")
            )
            self._corpus_cache = None
            self._bm25 = None

    return foreach_batch_index_merge(chunks, write_fn, ckpt)


VectorPipeline.ingest_stream = _ingest_stream_method
