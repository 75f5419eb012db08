"""auto_vectordb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of kstyle2198/auto_vectordb.

The reference (/root/reference) is a document→VectorDB pipeline: ingest files,
parse PDFs per page, hash/normalize text, embed (1024-d), persist to row stores,
bulk-index into Elasticsearch, and serve hybrid BM25 + kNN top-k search. This
package re-expresses those semantics as idiomatic Spark DataFrame algebra:

- one explicit-schema DataFrame data model (``schema.py``) replaces the four
  storage dialects (upload dir / pickle / Postgres / ES mapping);
- built-in Catalyst operators cover the whole relational surface
  (``operators/relational.py``);
- BM25 is pure DataFrame algebra over corpus-statistics tables
  (``operators/bm25.py``);
- exact kNN is a broadcast crossJoin + JVM-side vector expressions, approximate
  kNN is MLlib LSH / IVF bucket pruning (``operators/knn.py``);
- hybrid fusion is a full-outer join of score DataFrames
  (``operators/hybrid.py``);
- beyond reference parity: LLM-data-pipeline operators — dedup (exact /
  MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine), text analytics,
  multimodal column plumbing (``operators/dedup.py``, ``textstats.py``,
  ``multimodal.py``) — all designed for 100 TB scale.
"""

__version__ = "0.1.0"
