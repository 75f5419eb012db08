"""SQL-callable sugar surface: Spark 4 SQL UDFs over the engine's views.

SURVEY §4/§7 left "SQL sugar" (``SELECT ... FROM similarity_top_k(...)``)
as an optional extension — the reference exposes search only through a
FastAPI endpoint (/root/reference/backend/routers/es_index.py:99-127) whose
body is a hand-built ES DSL dict. Here the same surface is ANSI-ish SQL:
Spark 4's SQL user-defined functions (``CREATE TEMPORARY FUNCTION ...
RETURN <query>``) let us publish scalar vector math and table-valued
retrieval functions whose bodies are *inlined into the calling plan by
Catalyst at analysis time* — no Python round-trip, no custom rule, full
whole-stage codegen (tests assert no ``Python`` node in the physical plan).

Scale notes:
- The TVF bodies are the same plan shapes as the DataFrame operators
  (operators/knn.py, operators/bm25.py, operators/hybrid.py): broadcastable
  one-row query side × corpus scan, windowed top-k, postings built with ONE
  (term, doc_id) shuffle. ``EXPLAIN SELECT * FROM similarity_top_k(0, 10)``
  shows the identical exchange structure.
- ``LIMIT <param>`` is rejected (must be foldable), so top-k cuts use
  ``row_number() <= k`` — which is also the deterministic-tie-break form
  the parity rules require (rank on rounded score, id tie-break). That
  window is unpartitioned but its input is ONE query's already-reduced
  candidate set (docs matching that query's terms / one query's scored
  rows), not the corpus — the WindowExec single-partition warning here is
  bounded by per-query fan-out, and the batched DataFrame operators
  (windowed per query_id) remain the multi-query scale path.
- These are per-query conveniences. The batched DataFrame operators remain
  the bulk path: a TVF call plans one job per query, while
  ``knn_exact``/``bm25.search`` score thousands of queries in one job.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .functions.text import TOKEN_SPLIT_RE
from .operators.bm25 import B, K1
from .operators.hybrid import TEXT_BOOST, VECTOR_BOOST

# Spark-SQL twin of functions/text.py::tokenize (DuckDB twin in plans/parity.py)
TOKS_SPARK_SQL = "filter(split(lower({c}), '{re}'), t -> t != '')".format(
    c="{c}", re=TOKEN_SPLIT_RE
)

_SCALARS = [
    # Same expression tree as functions/vector.py::dot — bit-identical doubles.
    """
    CREATE OR REPLACE TEMPORARY FUNCTION vec_dot(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
    RETURNS DOUBLE
    RETURN aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION vec_cosine(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
    RETURNS DOUBLE
    -- nullif + nanvl mirror functions/vector.py::cosine's
    -- nan_to_null(try_divide(...)): a zero-norm (dead) vector scores NULL
    -- (never DIVIDE_BY_ZERO), and a NaN-element vector scores NULL too —
    -- Spark orders NaN as the LARGEST double, so without nanvl a single
    -- NaN embedding would WIN every ORDER BY score DESC top-k
    RETURN nanvl(
        vec_dot(a, b) / nullif(sqrt(vec_dot(a, a)) * sqrt(vec_dot(b, b)), 0),
        CAST(NULL AS DOUBLE))
    """,
    f"""
    CREATE OR REPLACE TEMPORARY FUNCTION tokenize_text(s STRING)
    RETURNS ARRAY<STRING>
    RETURN {TOKS_SPARK_SQL.format(c="s")}
    """,
]

# V2 as SQL: query row (1) × corpus scan, rounded-then-ranked (parity rule 2).
# qnorm is computed once on the one-row query side; the per-pair work is one
# dot + one corpus-side norm, matching operators/knn.py::knn_exact.
_SIMILARITY_TOP_K = """
CREATE OR REPLACE TEMPORARY FUNCTION similarity_top_k(qid BIGINT, k INT)
RETURNS TABLE (query_id BIGINT, vec_id BIGINT, score DOUBLE)
RETURN
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS ARRAY<DOUBLE>) AS qv,
         sqrt(vec_dot(CAST(embedding AS ARRAY<DOUBLE>),
                      CAST(embedding AS ARRAY<DOUBLE>))) AS qnorm
  FROM embeddings WHERE vec_id = qid
),
c AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS cv FROM embeddings),
scored AS (
  -- nanvl mirrors vec_cosine: a NaN-element corpus row must score NULL
  -- (sorts LAST under DESC), never NaN (sorts FIRST — silent corruption)
  SELECT q.query_id, c.vec_id,
         round(nanvl(vec_dot(q.qv, c.cv)
                     / nullif(q.qnorm * sqrt(vec_dot(c.cv, c.cv)), 0),
                     CAST(NULL AS DOUBLE)), 6)
           AS score
  FROM q CROSS JOIN c
),
ranked AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id ASC) AS rn
  FROM scored
)
SELECT query_id, vec_id, score FROM ranked WHERE rn <= k
"""

# Shared BM25 CTE chain (Lucene formula, operators/bm25.py): postings pay the
# single (term, doc_id) shuffle; df/dl/avgdl are map-side-combined aggs; the
# tiny query-term set prunes postings via a (broadcast) hash join.
_BM25_BODY = f"""
tok AS (SELECT doc_id, {TOKS_SPARK_SQL.format(c="text")} AS toks FROM documents),
tf0 AS (SELECT doc_id, explode(toks) AS term FROM tok),
postings AS (SELECT term, doc_id, count(*) AS tf FROM tf0 GROUP BY term, doc_id),
dl AS (SELECT doc_id, count(*) AS dl FROM tf0 GROUP BY doc_id),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tdf AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
qt AS (
  SELECT DISTINCT term
  FROM (SELECT explode({TOKS_SPARK_SQL.format(c="q")}) AS term)
),
matched AS (
  SELECT p.doc_id,
         ln(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
         * (p.tf * ({K1} + 1.0))
         / (p.tf + {K1} * (1.0 - {B} + {B} * d.dl / s.avgdl)) AS term_score
  FROM qt JOIN postings p ON p.term = qt.term
  JOIN tdf t ON t.term = qt.term
  JOIN dl d ON d.doc_id = p.doc_id
  CROSS JOIN stats s
),
bm25 AS (SELECT doc_id, round(sum(term_score), 6) AS score
         FROM matched GROUP BY doc_id)
"""

_LEXICAL_TOP_K = f"""
CREATE OR REPLACE TEMPORARY FUNCTION lexical_top_k(q STRING, k INT)
RETURNS TABLE (doc_id BIGINT, score DOUBLE)
RETURN
WITH {_BM25_BODY},
ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
  FROM bm25
)
SELECT doc_id, score FROM ranked WHERE rn <= k
"""

# V4 as SQL: weighted bool-should fusion (text {TEXT_BOOST} / vector
# {VECTOR_BOOST}, minimum_should_match=1 ≡ full-outer membership, min_score
# cut) — elasticsearch_index.py:215-306 semantics. Legs rounded to 6 BEFORE
# fusing (parity rule: the fused double is then bit-identical cross-engine).
_HYBRID_TOP_K = f"""
CREATE OR REPLACE TEMPORARY FUNCTION hybrid_top_k(
    qid BIGINT, q STRING, k INT, min_score DOUBLE)
RETURNS TABLE (doc_id BIGINT, score DOUBLE)
RETURN
WITH {_BM25_BODY},
vq AS (
  SELECT CAST(embedding AS ARRAY<DOUBLE>) AS qv,
         sqrt(vec_dot(CAST(embedding AS ARRAY<DOUBLE>),
                      CAST(embedding AS ARRAY<DOUBLE>))) AS qnorm
  FROM embeddings WHERE vec_id = qid
),
vs AS (
  -- nanvl as in similarity_top_k: NaN embeddings score NULL, and the
  -- COALESCE in fused then treats them as a zero vector-leg contribution
  SELECT c.vec_id AS doc_id,
         round(nanvl(vec_dot(vq.qv, CAST(c.embedding AS ARRAY<DOUBLE>))
               / nullif(vq.qnorm * sqrt(vec_dot(CAST(c.embedding AS ARRAY<DOUBLE>),
                                                CAST(c.embedding AS ARRAY<DOUBLE>))),
                        0),
               CAST(NULL AS DOUBLE)),
               6) AS knn
  FROM vq CROSS JOIN embeddings c
),
fused AS (
  SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
         {TEXT_BOOST} * COALESCE(b.score, 0.0D)
           + {VECTOR_BOOST} * COALESCE(v.knn, 0.0D) AS score
  FROM bm25 b FULL OUTER JOIN vs v ON b.doc_id = v.doc_id
),
ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
  FROM fused WHERE score >= min_score
)
SELECT doc_id, score FROM ranked WHERE rn <= k
"""

ALL_FUNCTIONS = (
    "vec_dot vec_cosine tokenize_text similarity_top_k lexical_top_k hybrid_top_k"
).split()


def register_sql_surface(spark: SparkSession) -> list[str]:
    """Register the SQL surface (idempotent). The table functions resolve the
    ``embeddings``/``documents`` temp views at *call* time, so register once
    per session and point the views wherever (plans.parity.load_views or the
    pipeline facade's corpus). Returns the registered function names."""
    for ddl in [*_SCALARS, _SIMILARITY_TOP_K, _LEXICAL_TOP_K, _HYBRID_TOP_K]:
        spark.sql(ddl)
    return list(ALL_FUNCTIONS)
