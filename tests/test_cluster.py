"""Gates for the clustering / PQ / corpus-quality operators whose driver
check is rows-only (iterative or approximate): exact agreement with a numpy
reference for Lloyd, recall gates for PQ ADC, semantic sanity for the
quality scores, and quota exactness for domain rebalancing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from auto_vectordb_spark.operators import cluster as CL
from auto_vectordb_spark.operators import knn as KNN
from auto_vectordb_spark.operators import pq as PQ
from auto_vectordb_spark.operators import quality as QL
from auto_vectordb_spark.plans.parity import load_views


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    return load_views(spark, sf_dir)


def _np_corpus(tables):
    rows = tables["embeddings"].select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    return ids, mat


def _np_lloyd(ids, mat, k=8, iters=3):
    """Reference Lloyd mirroring cluster.py's determinism contract:
    distances rounded to 6 decimals before argmin (tie -> lowest cid),
    means via the same 1e7 int quantization."""
    centroids = mat[np.argsort(ids)[:k]].copy()
    for _ in range(iters):
        d = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2).round(6)
        assign = d.argmin(axis=1)  # argmin takes first (lowest cid) on ties
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                q = np.round(members * 10_000_000)
                centroids[c] = q.sum(axis=0) / (len(members) * 10_000_000)
    d = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2).round(6)
    return d.argmin(axis=1), d.min(axis=1)


def test_lloyd_matches_numpy_reference(spark, tables):
    assigned, _, inertia = CL.lloyd(tables["embeddings"], k=8, iters=3)
    got = {r["vec_id"]: (r["cluster_id"], r["dist"]) for r in assigned.collect()}
    ids, mat = _np_corpus(tables)
    ref_assign, ref_dist = _np_lloyd(ids, mat, k=8, iters=3)
    for i, vid in enumerate(ids):
        assert got[vid][0] == ref_assign[i], f"vec {vid} cluster mismatch"
        assert abs(got[vid][1] - round(float(ref_dist[i]), 6)) < 1e-9
    # Lloyd monotonicity: inertia never increases across iterations
    assert all(b <= a + 1e-6 for a, b in zip(inertia, inertia[1:]))


def test_assign_centroids_plan_is_map_only(spark, tables):
    """The scale claim: assignment has no shuffle and no join in the plan."""
    cents = [
        list(r["c"])
        for r in tables["embeddings"]
        .filter(F.col("vec_id") < 8)
        .select(F.col("embedding").cast("array<double>").alias("c"))
        .collect()
    ]
    plan = (
        CL.assign_centroids(tables["embeddings"], cents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_outliers_match_numpy(spark, tables):
    out = CL.outliers_by_group_centroid(tables["embeddings"], top_n=20).collect()
    rows = tables["embeddings"].select("vec_id", "label", "embedding").collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r)
    dists = {}
    for label, members in by_label.items():
        mat = np.array([list(m["embedding"]) for m in members], dtype=np.float64)
        q = np.round(mat * 10_000_000)
        centroid = q.sum(axis=0) / (len(members) * 10_000_000)
        for m, row in zip(mat, members):
            dists[row["vec_id"]] = round(float(((m - centroid) ** 2).sum().round(6)), 6)
    expected = sorted(dists.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["vec_id"], r["dist"]) for r in out] == [
        (vid, pytest.approx(d, abs=1e-9)) for vid, d in expected
    ]


def test_pq_adc_recall_vs_exact(spark, tables):
    """Seed-codebook PQ is coarse; gate a floor and require the ADC ranking
    to beat random (recall@10 of 10/500 under random ≈ 0.02)."""
    emb = tables["embeddings"]
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    books = PQ.pq_codebooks_seed(emb, m=4, ksub=16)
    codes = PQ.pq_encode(emb, books)
    got = PQ.pq_adc_topk(queries, codes, books, k=10).collect()
    # exact L2 top-10 (PQ approximates L2, not cosine)
    ids, mat = _np_corpus(tables)
    qmat = mat[np.argsort(ids)[:5]]
    hits = 0
    for qi in range(5):
        d = ((mat - qmat[qi]) ** 2).sum(axis=1)
        exact = set(ids[np.argsort(d)[:10]])
        approx = {r["vec_id"] for r in got if r["query_id"] == qi}
        hits += len(exact & approx)
    recall = hits / 50
    assert recall >= 0.2, f"PQ ADC recall@10 {recall} below floor"


def test_pq_kmeans_codebooks_reduce_mse(spark, tables):
    """MLlib-trained codebooks must reconstruct better (lower quantization
    MSE) than the seeded-sample baseline — MSE is the PQ training objective.
    (Recall@10 on seed-set queries is NOT a fair comparison: the seed
    codebook contains the query vectors themselves.)"""
    emb = tables["embeddings"]
    ids, mat = _np_corpus(tables)

    def mse(books):
        codes = {r["vec_id"]: list(r["codes"]) for r in PQ.pq_encode(emb, books).collect()}
        sub = len(books[0][0])
        err = 0.0
        for i, vid in enumerate(ids):
            recon = np.concatenate([np.array(books[j][c]) for j, c in enumerate(codes[vid])])
            err += float(((mat[i] - recon) ** 2).sum())
        return err / len(ids)

    m_seed = mse(PQ.pq_codebooks_seed(emb, m=4, ksub=16))
    m_km = mse(PQ.pq_codebooks_kmeans(emb, m=4, ksub=16))
    assert m_km < m_seed, f"kmeans codebooks did not reduce MSE: {m_km} vs {m_seed}"


def test_dsir_weights_favor_target_domain(spark, tables):
    w = QL.dsir_weights(tables["documents"], F.col("lang") == "en")
    joined = w.join(tables["documents"].select("doc_id", "lang"), "doc_id")
    avg = {
        r["is_en"]: r["aw"]
        for r in joined.groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("weight").alias("aw"))
        .collect()
    }
    assert avg[True] > avg[False], f"target docs not favored: {avg}"
    # weight is derived from the exact quantized integer (the verified column)
    bad = w.filter(F.col("weight") != F.col("weight_q_micro").cast("double") / 1e6)
    assert bad.count() == 0


def test_bigram_lm_hand_computed(spark):
    """Exact add-one bigram LM semantics on a hand-computable corpus.
    (The synthetic documents table is order-free word soup, so a
    scramble-detection heuristic carries no signal there; the cross-engine
    oracle covers the big-data path, this covers the math.)

    corpus: d1="a b a b", d2="a c" →
    c("a b")=2, c("b a")=1, c("a c")=1; c1(a)=3, c1(b)=1; V=|{a,b}|=2
    nll(a b)=ln(3+2)-ln(2+1); nll(b a)=ln(1+2)-ln(1+1); nll(a c)=ln(3+2)-ln(1+1)
    d1 = avg over [ab, ba, ab]; d2 = nll(a c)
    """
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in QL.bigram_lm_score(docs).collect()}
    q = lambda x: round(x * 1_000_000) / 1_000_000  # the operator's per-bigram quantization
    nll_ab = q(math.log(5.0) - math.log(3.0))
    nll_ba = q(math.log(3.0) - math.log(2.0))
    nll_ac = q(math.log(5.0) - math.log(2.0))
    assert rows[1]["n_bigrams"] == 3
    assert rows[1]["nll"] == pytest.approx(round((2 * nll_ab + nll_ba) / 3, 6), abs=1e-6)
    assert rows[2]["n_bigrams"] == 1
    assert rows[2]["nll"] == pytest.approx(round(nll_ac, 6), abs=1e-6)
    # nll_q_micro is the exact int64 sum of quantized per-bigram terms —
    # the verified cross-engine column; nll is derived from it
    assert rows[1]["nll_q_micro"] == round(2 * nll_ab * 1e6) + round(nll_ba * 1e6)
    assert rows[2]["nll_q_micro"] == round(nll_ac * 1e6)
    for r in rows.values():
        assert r["nll"] == round(r["nll_q_micro"] / (r["n_bigrams"] * 1e6), 6)


def test_domain_rebalance_explicit_shares(spark, tables):
    docs = tables["documents"]
    shares = {"src0": 0.5, "src1": 0.25, "src2": 0.25}
    subset = docs.filter(F.col("source").isin(*shares))
    out = QL.domain_rebalance(subset, shares=shares)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    base = {
        r["source"]: r["n"]
        for r in subset.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    t = min(base[s] // sh for s, sh in ((s, shares[s]) for s in shares))
    for s, sh in shares.items():
        assert counts[s] == int(t * sh), (s, counts, base)
    # stability: a second run selects the identical ids
    ids1 = {r["doc_id"] for r in out.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in QL.domain_rebalance(subset, shares=shares).select("doc_id").collect()}
    assert ids1 == ids2


def test_kmeans_oracle_quantizer_in_sync():
    """_kmeans_sql hardcodes the quantizer in SQL text; it must equal the
    operator's _Q or the oracle silently desynchronizes."""
    from auto_vectordb_spark.operators.cluster import _Q
    from auto_vectordb_spark.plans.parity import _CL_QSQL

    assert _CL_QSQL == _Q


def test_gram_matrix_matches_numpy_quantized_reference(spark):
    import numpy as np

    from auto_vectordb_spark.operators import cluster as CL

    rng = [[0.5, -1.25, 2.0], [1.5, 0.25, -0.75], [-2.0, 1.0, 0.5]]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(rng)], ["vec_id", "embedding"])
    got = {(r["i"], r["j"]): r["sum_q"] for r in CL.gram_matrix(df).collect()}
    X = np.array(rng, dtype=np.float64)
    P = X[:, :, None] * X[:, None, :] * 1e6
    Q = (np.sign(P) * np.floor(np.abs(P) + 0.5)).astype(np.int64).sum(axis=0)
    for i in range(3):
        for j in range(i, 3):
            assert got[(i + 1, j + 1)] == Q[i, j], (i, j)
    # upper triangle only, diagonal is a positive sum of squares
    assert len(got) == 6
    assert all(got[(d, d)] > 0 for d in (1, 2, 3))


def test_mean_pool_exact_long_matches_python(spark, sf_dir):
    from pyspark.sql import functions as F
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(40)
    rows = emb.collect()
    out = CL.mean_pool_exact_long(emb, F.col("vec_id") / 4).collect()
    # python model: quantized-int sums per (group, pos)
    import collections
    model = collections.defaultdict(lambda: [0, 0])  # (g,p) -> [n, s_q]
    for r in rows:
        g = r["vec_id"] // 4
        for p, v in enumerate(r["embedding"]):
            m = model[(g, p)]
            m[0] += 1
            m[1] += round(float(v) * 10_000_000)
    assert len(out) == len(model)
    for r in out:
        n, s_q = model[(r["group_id"], r["pos"])]
        assert (r["n"], r["s_q"]) == (n, s_q)
        assert r["mean"] == s_q / (n * 10_000_000)


def test_silhouette_centroid_bounds_and_degenerate_cases(spark):
    # two tight groups near distinct centroids -> high mean_s;
    # duplicate centroids -> b == a -> s == 0
    vecs = spark.createDataFrame(
        [(i, [0.0, float(i % 2) * 10 + (i % 3) * 0.01]) for i in range(12)],
        ["vec_id", "embedding"],
    )
    cents = [[0.0, 0.0], [0.0, 10.0]]
    out = {r["cluster_id"]: r for r in CL.silhouette_centroid(vecs, cents).collect()}
    assert set(out) == {0, 1} and out[0]["n"] + out[1]["n"] == 12
    for r in out.values():
        assert 0 <= r["sum_s_q"] <= r["n"] * 1_000_000
        assert r["mean_s"] == r["sum_s_q"] / (r["n"] * 1_000_000)
        assert r["mean_s"] > 0.99  # tight, well-separated clusters
    dup = CL.silhouette_centroid(vecs, [[0.0, 0.0], [0.0, 0.0]]).collect()
    assert all(r["sum_s_q"] == 0 for r in dup)  # b == a everywhere


def test_empty_quantizer_degrades_to_empty_results(spark):
    """Empty-input contract (SCALE.md r7): a quantizer trained on an empty
    slice has no cells — assignment/silhouette/lloyd must return EMPTY
    frames with the normal schemas, never crash at analysis time on
    array_min(array()) over VOID."""
    vecs = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])], ["vec_id", "embedding"]
    )
    empty = vecs.where("vec_id < 0")

    a = CL.assign_centroids(vecs, [])
    assert a.collect() == []
    assert [f.name for f in a.schema] == ["vec_id", "cluster_id", "dist"]
    assert a.schema["cluster_id"].dataType.simpleString() == "int"
    assert a.schema["dist"].dataType.simpleString() == "double"

    s = CL.silhouette_centroid(vecs, [])
    assert s.collect() == []
    assert [f.name for f in s.schema] == ["cluster_id", "n", "sum_s_q", "mean_s"]
    # k=1 is equally degenerate: no second-nearest centroid exists
    assert CL.silhouette_centroid(vecs, [[0.0, 0.0]]).collect() == []

    assigned, cents, inertia = CL.lloyd(empty, k=4, iters=2)
    assert assigned.collect() == [] and cents == [] and inertia == []


def test_lloyd_fewer_rows_than_k(spark):
    """Tiny-slice contract: with n < k rows the seed yields only n
    centroids and every iteration must track that effective k — the
    centroid update indexed range(k) and crashed on a 1-row table."""
    vecs = spark.createDataFrame([(7, [1.0, 2.0])], ["vec_id", "embedding"])
    assigned, cents, inertia = CL.lloyd(vecs, k=8, iters=2)
    assert len(cents) == 1 and cents[0] == [1.0, 2.0]
    rows = assigned.collect()
    assert [(r["vec_id"], r["cluster_id"], r["dist"]) for r in rows] == [(7, 0, 0.0)]
    assert inertia == [0.0, 0.0]


def test_gram_matrix_null_and_ragged_rows_contribute_present_dims_only(spark):
    """Dirty-data contract: a NULL embedding contributes nothing to the
    Gram matrix and a ragged (short) vector contributes only its present
    dims — the Arrow kernel zero-pads instead of letting np.stack kill
    the partition task."""
    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0]),
            (2, None),          # NULL vector: no contribution
            (3, [3.0]),         # ragged: contributes only dim 1
            (4, []),            # zero-length: no contribution
        ],
        "vec_id long, embedding array<double>",
    )
    out = {(r["i"], r["j"]): r["sum_q"] for r in CL.gram_matrix(df).collect()}
    # (1,1): 1*1 from row1 + 3*3 from row3; (1,2)/(2,2): row1 only
    assert out[(1, 1)] == round(1.0 * 1.0 * 1e6) + round(3.0 * 3.0 * 1e6)
    assert out[(1, 2)] == round(1.0 * 2.0 * 1e6)
    assert out[(2, 2)] == round(2.0 * 2.0 * 1e6)
    assert set(out) == {(1, 1), (1, 2), (2, 2)}


def test_gram_matrix_masks_nonfinite_and_overflow_rows(spark):
    """r7 ADVICE hazard, fixed r9: a NaN (or inf) element, or a magnitude
    whose quantized product exceeds int64, used to flow through
    astype(int64) as SILENT garbage (INT64_MIN) — a wrong-value path, not
    a crash. Such rows now drop like NULL rows; clean rows are unaffected."""
    import math

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0]),
            (2, [math.nan, 1.0]),   # NaN element: whole row drops
            (3, [math.inf, 1.0]),   # inf element: whole row drops
            (4, [1e30, 1e30]),      # 1e60·1e6 >> 2^63: whole row drops
            (5, [2.0, 0.5]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = {(r["i"], r["j"]): r["sum_q"] for r in CL.gram_matrix(df).collect()}
    assert out[(1, 1)] == round(1.0 * 1e6) + round(4.0 * 1e6)
    assert out[(1, 2)] == round(2.0 * 1e6) + round(1.0 * 1e6)
    assert out[(2, 2)] == round(4.0 * 1e6) + round(0.25 * 1e6)
    assert set(out) == {(1, 1), (1, 2), (2, 2)}
    # and every surviving value is sane — no INT64_MIN garbage anywhere
    assert all(abs(v) < 2**40 for v in out.values())


def test_gram_matrix_merges_ragged_partials_across_arrow_batches(spark):
    """The kernel accumulates per-BATCH partials; with ragged rows the
    partials have different widths and both merge branches (acc wider /
    partial wider) must align on the top-left block. Forcing one-row
    Arrow batches makes every row its own partial."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        for rows in ([(1, [3.0]), (2, [1.0, 2.0])],
                     [(1, [1.0, 2.0]), (2, [3.0])]):  # both merge orders
            df = spark.createDataFrame(
                rows, "vec_id long, embedding array<double>"
            ).coalesce(1)
            out = {(r["i"], r["j"]): r["sum_q"] for r in CL.gram_matrix(df).collect()}
            assert out[(1, 1)] == round(9.0 * 1e6) + round(1.0 * 1e6)
            assert out[(1, 2)] == round(2.0 * 1e6)
            assert out[(2, 2)] == round(4.0 * 1e6)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_lloyd_seed_with_low_id_null_embedding(spark):
    """r7 ADVICE defect, fixed r9: a NULL embedding among the k LOWEST ids
    must fail the ROW (seed scan filters isNotNull & size>0), not kill the
    job with a driver-side TypeError in list(r['c']). Also pinned by the
    low-vec_id NULL row in the main dirty mirror."""
    df = spark.createDataFrame(
        [(0, None), (1, [1.0, 2.0]), (2, [3.0, 4.0]), (3, [5.0, 6.0])],
        "vec_id long, embedding array<double>",
    )
    assigned, cents, _ = CL.lloyd(df, k=2, iters=1)
    # seeds skip the NULL row: k=2 valid seeds (vec_ids 1,2), then one
    # mean update over the 3 valid vectors — both centroids stay real
    assert len(cents) == 2
    assert all(c is not None and len(c) == 2 for c in cents)
    assert assigned.where(F.col("vec_id") == 1).count() == 1


def test_lloyd_seed_skips_low_id_ragged_and_null_element_rows(spark):
    """r9 review: a ragged or NULL-element vector among the k lowest ids
    must not become a seed (it would silently poison every assignment
    distance) — valid_vec pins seeds to the corpus's modal dim."""
    df = spark.createDataFrame(
        [
            (0, [9.9]),                 # ragged: excluded from seeds
            (1, [1.0, None]),           # NULL element: excluded from seeds
            (2, [1.0, 2.0]),
            (3, [3.0, 4.0]),
            (4, [5.0, 6.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    _, cents, _ = CL.lloyd(df, k=2, iters=1)
    assert len(cents) == 2
    assert all(len(c) == 2 and all(x is not None for x in c) for c in cents)


def test_pq_codebooks_seed_skips_ragged_rows(spark):
    from auto_vectordb_spark.operators import pq as PQ

    df = spark.createDataFrame(
        [(0, [9.9, 9.9, 9.9]), (1, [1.0, 2.0, 3.0, 4.0]), (2, [5.0, 6.0, 7.0, 8.0])],
        "vec_id long, embedding array<double>",
    )
    books = PQ.pq_codebooks_seed(df, m=2, ksub=2)
    # the 3-dim ragged row is not a training vector: every codeword is a
    # full half-vector of the modal 4-dim space
    assert len(books) == 2
    assert all(len(cw) == 2 for book in books for cw in book)
