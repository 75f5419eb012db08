"""PageRank gated against a pure-Python power-iteration reference."""

from pyspark.sql import functions as F

from auto_vectordb_spark.operators import graph as G


def _python_pagerank(edges, damping=0.85, iterations=10):
    """Power iteration WITH dangling-mass redistribution (matches graph.py)."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    out = {}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dangling = sum(rank[v] for v in nodes if v not in out)
        base = (1.0 - damping) / n + damping * dangling / n
        contrib = {}
        for a, b in edges:
            contrib[b] = contrib.get(b, 0.0) + rank[a] / out[a]
        rank = {v: base + damping * contrib.get(v, 0.0) for v in nodes}
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


def test_pagerank_directed_with_sinks_conserves_mass(spark):
    """General directed input: dangling mass is redistributed each round,
    so ranks match the python reference AND sum to exactly 1."""
    edges = [(1, 2), (2, 3), (1, 4), (4, 3), (5, 1)]  # 3 is a sink
    got = {
        r["node"]: r["rank"]
        for r in G.pagerank(
            spark.createDataFrame(edges, ["src", "dst"]), iterations=8
        ).collect()
    }
    want = _python_pagerank(edges, iterations=8)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # the sink fed by two paths outranks the feeder leaf
    assert got[3] > got[5]


def test_pagerank_empty_graph(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    out = G.pagerank(empty, iterations=3)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0


def test_copurchase_edges_symmetric(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e = G.copurchase_edges(li, min_support=2)
    fwd = {(r["src"], r["dst"]) for r in e.collect()}
    assert len(fwd) > 0 and all((b, a) in fwd for a, b in fwd)
