"""End-to-end quickstart: the reference's full endpoint lifecycle on Spark.

Every step below names the auto_vectordb (reference) endpoint it replaces —
a user of the reference drives the same flow with these calls. Run:

    python examples/quickstart.py [workdir]

The bundled deterministic text parser/embedder stand in for Docling/Ollama
(this container has neither); swap them via ``parser=`` / ``embed_backend=``
without touching the flow.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from auto_vectordb_spark.pipeline import VectorPipeline
from auto_vectordb_spark.session import get_spark


def main(workdir: str) -> None:
    spark = get_spark(app_name="quickstart", cpus=8)
    base = Path(workdir)

    # --- make two tiny "uploaded documents" -------------------------------
    src = base / "local_docs" / "cat_a"
    src.mkdir(parents=True)
    (src / "spark_notes.txt").write_text(
        "Spark shuffles data between stages. Broadcast joins avoid the "
        "shuffle when one side is small.\f"
        "Adaptive query execution coalesces partitions at runtime."
    )
    (src / "duckdb_notes.txt").write_text(
        "DuckDB scans parquet with predicate pushdown. Vectorized "
        "execution processes batches of rows."
    )

    p = VectorPipeline(spark, str(base / "store"), dim=64, embed_backend="hash")

    # POST /upload, /upload_chunk  →  stage_files
    staged = p.stage_files([str(f) for f in sorted(src.iterdir())], "cat_a")
    print(f"staged {len(staged)} files")

    # POST /batch_parse_by_folder  →  parse (binaryFile scan → page rows)
    pages = p.parse(parser="text")

    # parse_pdf_by_page's embed step  →  embed (Arrow-batched pandas_udf)
    chunks = p.embed(pages)

    # POST /insert_from_pickle  →  save_corpus (parquet partitioned by lv1_cat)
    p.save_corpus(chunks, mode="overwrite")
    print(f"corpus rows: {p.count()}")

    # POST /index/document  →  build_index (BM25 postings/stats, idempotent)
    p.build_index()

    # GET /unique-filepath/{table}  →  distinct_filepaths
    print(f"distinct filepaths: {len(p.distinct_filepaths())}")

    # POST /search  →  search (hybrid BM25*1.0 + cosine*0.8, min_score, top-k)
    hits = p.search("broadcast shuffle", size=3, mode="hybrid")
    hits.select("score", "filename", "page").show(truncate=False)

    # DELETE /document/{id}  →  delete_by_ids (corpus rewrite minus ids)
    victim = p.corpus().select("id").first()["id"]
    p.delete_by_ids([victim])
    print(f"corpus rows after delete: {p.count()}")

    # staging cleanup (reference _clear_folder / remove_original)  →
    p.clear_staging()
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1:
        main(sys.argv[1])
    else:
        with tempfile.TemporaryDirectory() as d:
            main(d)
