"""PageRank gated against a pure-Python power-iteration reference."""

from pyspark.sql import functions as F

from auto_vectordb_spark.operators import graph as G


def _python_pagerank(edges, damping=0.85, iterations=10):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    out = {}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = {}
        for a, b in edges:
            contrib[b] = contrib.get(b, 0.0) + rank[a] / out[a]
        rank = {
            v: (1.0 - damping) / n + damping * contrib.get(v, 0.0) for v in nodes
        }
    return rank


EDGES = [
    (1, 2), (2, 1),
    (2, 3), (3, 2),
    (3, 1), (1, 3),
    (3, 4), (4, 3),
    (4, 5), (5, 4),
]


def test_pagerank_matches_python_reference(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in G.pagerank(edges, iterations=10).collect()}
    want = _python_pagerank(EDGES, iterations=10)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    # undirected graph: rank mass is conserved exactly (no dangling loss)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # the triangle-core node bridging to the tail outranks the leaf
    assert got[3] > got[5]


def test_pagerank_directed_dangling_loses_mass(spark):
    """Documented semantics: without dangling redistribution, a sink node
    leaks mass — total rank < 1 on a directed chain."""
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    got = {r["node"]: r["rank"] for r in G.pagerank(edges, iterations=5).collect()}
    want = _python_pagerank([(1, 2), (2, 3)], iterations=5)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9
    assert sum(got.values()) < 1.0


def test_copurchase_edges_symmetric(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e = G.copurchase_edges(li, min_support=2)
    fwd = {(r["src"], r["dst"]) for r in e.collect()}
    assert len(fwd) > 0 and all((b, a) in fwd for a, b in fwd)
