"""Differential tests for distributed connected components.

The large-star/small-star implementation (functions/graph.py) must agree
with a driver-side union-find on every graph shape we can throw at it:
chains, stars, cycles, disconnected singleton-free sets, and seeded
random graphs. The reference engine has no graph operator — this backs
the distributed mode of drop_near_dups.
"""

import random

import pytest
from pyspark.sql import functions as F

from krnel_graph_spark.functions.graph import connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    nodes = set()
    for a, b in edges:
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in sorted(nodes)}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    out = connected_components(df).collect()
    return {r["node"]: r["component"] for r in out}


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2)],
        [(1, 2), (2, 3), (3, 4), (4, 5)],          # chain
        [(10, 1), (10, 2), (10, 3), (10, 4)],       # star, center largest
        [(1, 2), (2, 3), (3, 1)],                   # cycle
        [(1, 2), (3, 4), (5, 6)],                   # three components
        [(2, 1), (1, 2), (2, 2)],                   # dupes + self-loop
        [(7, 3), (3, 9), (9, 7), (100, 50)],        # cycle + pair
    ],
)
def test_small_graphs(spark, edges):
    assert _run(spark, edges) == _union_find(edges)


@pytest.mark.parametrize("seed,n,m", [(0, 60, 40), (1, 200, 150), (2, 500, 700)])
def test_random_graphs(spark, seed, n, m):
    rng = random.Random(seed)
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(m)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run(spark, edges) == _union_find(edges)


def test_long_chain_converges_within_log_rounds(spark):
    # 256-node chain: worst case for label propagation (O(n) rounds),
    # but star contraction converges in O(log n).
    edges = [(i, i + 1) for i in range(255)]
    out = _run(spark, edges)
    assert set(out.values()) == {0}
    assert len(out) == 256


def test_string_node_ids(spark):
    edges = [("b", "a"), ("b", "c"), ("x", "y")]
    df = spark.createDataFrame(edges, "src STRING, dst STRING")
    out = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_distributed_drop_near_dups_matches_driver_mode(spark):
    from krnel_graph_spark.functions import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kw = dict(num_perm=16, bands=4, jaccard_threshold=0.5)
    driver = dedup.drop_near_dups(docs, "text", "doc_id", **kw)
    dist = dedup.drop_near_dups(docs, "text", "doc_id", components="distributed", **kw)
    a = sorted(r["doc_id"] for r in driver.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in dist.select("doc_id").collect())
    assert a == b and len(a) > 0


def test_custom_column_names(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "doc_a BIGINT, doc_b BIGINT")
    out = connected_components(df, src="doc_a", dst="doc_b")
    assert out.columns == ["node", "component"]
    assert {tuple(r) for r in out.collect()} == {(1, 1), (2, 1), (3, 1)}


# --------------------------------------------------------------------- #
# pagerank                                                                #
# --------------------------------------------------------------------- #


def _py_pagerank(edges, damping=0.85, n_iter=5):
    """Pure-Python mirror: decimal contribution sums, round-10 ranks,
    dangling mass not redistributed."""
    from decimal import Decimal

    edges = sorted(set(edges))
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    od = {}
    for a, _ in edges:
        od[a] = od.get(a, 0) + 1
    r = {v: round(1.0 / n, 10) for v in nodes}
    for _ in range(n_iter):
        s = {v: Decimal(0) for v in nodes}
        for a, b in edges:
            c = r[a] / od[a]
            s[b] += Decimal(str(round(c, 12)))  # decimal(38,12) cast
        r = {
            v: round((1.0 - damping) / n + damping * float(s[v]), 10)
            for v in nodes
        }
    return r


def test_pagerank_matches_reference(spark):
    from krnel_graph_spark.functions.graph import pagerank

    edges = [(i, (i * 3 + 1) % 20) for i in range(60)] + [(5, 7), (7, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=5).collect()}
    exp = _py_pagerank(edges)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-9), v


def test_pagerank_hub_ranks_highest(spark):
    from krnel_graph_spark.functions.graph import pagerank

    # star: everyone links to 0
    edges = [(i, 0) for i in range(1, 30)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    assert ranks[0] == max(ranks.values())
    assert ranks[0] > 10 * ranks[1]


def test_pagerank_validation(spark):
    from krnel_graph_spark.functions.graph import pagerank

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)


def test_triangle_count_known_graph(spark):
    from krnel_graph_spark.functions.graph import triangle_count

    # K4 (4 triangles... K4 has C(4,3)=4 triangles) plus a pendant edge
    # and a duplicate/reversed edge to exercise canonicalization.
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (1, 0), (2, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for orient in ("id", "degree"):
        got = triangle_count(df, orient=orient).collect()[0]["n_triangles"]
        assert got == 4, (orient, got)


def test_triangle_count_matches_bruteforce_random(spark):
    import itertools

    import numpy as np

    from krnel_graph_spark.functions.graph import triangle_count

    rng = np.random.RandomState(3)
    n = 40
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    chosen = [pairs[i] for i in rng.choice(len(pairs), size=200, replace=False)]
    adj = set(chosen)
    want = sum(
        1
        for a, b, c in itertools.combinations(range(n), 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    )
    df = spark.createDataFrame(chosen, "src long, dst long")
    for orient in ("id", "degree"):
        got = triangle_count(df, orient=orient).collect()[0]["n_triangles"]
        assert got == want, (orient, got, want)


def test_clustering_coefficients(spark):
    from krnel_graph_spark.functions.graph import clustering_coefficients

    # triangle 0-1-2 plus pendant 2-3: c(0)=c(1)=1, c(2)=1/3, c(3)=0
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3)], "src long, dst long"
    )
    got = {r["node"]: r for r in clustering_coefficients(df).collect()}
    assert got[0]["coeff"] == 1.0 and got[0]["degree"] == 2
    assert got[1]["coeff"] == 1.0
    assert got[2]["coeff"] == round(1 / 3, 6) and got[2]["degree"] == 3
    assert got[3]["coeff"] == 0.0 and got[3]["n_triangles"] == 0


def test_clustering_coefficients_bruteforce(spark):
    import itertools

    import numpy as np

    from krnel_graph_spark.functions.graph import clustering_coefficients

    rng = np.random.RandomState(9)
    n = 25
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    chosen = [pairs[i] for i in rng.choice(len(pairs), size=90, replace=False)]
    adj = {i: set() for i in range(n)}
    for a, b in chosen:
        adj[a].add(b)
        adj[b].add(a)
    df = spark.createDataFrame(chosen, "src long, dst long")
    got = {r["node"]: r for r in clustering_coefficients(df).collect()}
    for v in range(n):
        d = len(adj[v])
        if d == 0:
            assert v not in got
            continue
        tri = sum(
            1 for x, y in itertools.combinations(sorted(adj[v]), 2) if y in adj[x]
        )
        assert got[v]["degree"] == d
        assert got[v]["n_triangles"] == tri
        want = round(tri / (d * (d - 1) / 2), 6) if d >= 2 else 0.0
        assert got[v]["coeff"] == want, (v, got[v]["coeff"], want)


def test_k_core_golden_and_bruteforce(spark):
    import numpy as np

    from krnel_graph_spark.functions.graph import k_core

    # triangle (2-core) + tail 2-3-4 that peels away entirely at k=2
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    got = {r["node"]: r["degree"] for r in k_core(df, k=2).collect()}
    assert got == {0: 2, 1: 2, 2: 2}
    assert k_core(df, k=3).count() == 0

    def brute(pairs, k):
        adj = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        changed = True
        while changed:
            changed = False
            for v in list(adj):
                if len(adj[v]) < k:
                    for u in adj.pop(v):
                        adj[u].discard(v)
                    changed = True
        return {v: len(ns) for v, ns in adj.items() if ns}

    rng = np.random.RandomState(17)
    n = 30
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    chosen = [pairs[i] for i in rng.choice(len(pairs), size=70, replace=False)]
    sdf = spark.createDataFrame(chosen, "src long, dst long")
    for k in (2, 3, 4):
        want = brute(chosen, k)
        got = {r["node"]: r["degree"] for r in k_core(sdf, k=k).collect()}
        assert got == want, (k, got, want)


def test_degree_assortativity_bruteforce(spark):
    import numpy as np

    from krnel_graph_spark.functions.graph import degree_assortativity

    rng = np.random.RandomState(23)
    n = 30
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    chosen = [pairs[i] for i in rng.choice(len(pairs), size=80, replace=False)]
    deg = {}
    for a, b in chosen:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in chosen:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    want = round(float(np.corrcoef(xs, ys)[0, 1]), 6)

    df = spark.createDataFrame(chosen, "src long, dst long")
    row = degree_assortativity(df).collect()[0]
    assert row["n_edges"] == 80
    assert abs(row["assortativity"] - want) < 2e-6

    # star graph: perfectly disassortative
    star = spark.createDataFrame([(0, i) for i in range(1, 6)], "src long, dst long")
    assert degree_assortativity(star).collect()[0]["assortativity"] == -1.0


def test_graph_ops_empty_and_trivial(spark):
    from krnel_graph_spark.functions.graph import (
        clustering_coefficients,
        degree_assortativity,
        k_core,
        triangle_count,
    )

    empty = spark.createDataFrame([], "src long, dst long")
    assert triangle_count(empty).collect()[0]["n_triangles"] == 0
    assert clustering_coefficients(empty).count() == 0
    assert k_core(empty, k=2).count() == 0
    row = degree_assortativity(empty).collect()[0]
    assert row["n_edges"] == 0 and row["assortativity"] == 0.0

    # a single edge: no triangles, degenerate (zero-variance) correlation
    one = spark.createDataFrame([(1, 2)], "src long, dst long")
    assert triangle_count(one).collect()[0]["n_triangles"] == 0
    assert degree_assortativity(one).collect()[0]["assortativity"] == 0.0


# --------------------------------------------------------------------- #
# label_propagation
# --------------------------------------------------------------------- #


def _lpa_ref(edges, n_iter):
    """Pure-Python mirror: synchronous rounds, argmax by (count, -label)."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    labels = {n: n for n in adj}
    for _ in range(n_iter):
        nxt = {}
        for n in adj:
            cnt = Counter(labels[m] for m in adj[n])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[n] = best[0]
        labels = nxt
    return labels


def test_label_propagation_two_cliques(spark):
    from krnel_graph_spark.functions.graph import label_propagation

    # Two 4-cliques bridged by a single edge: each clique converges to
    # its minimum member id; the bridge does not merge them.
    cl1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    cl2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = cl1 + cl2 + [(3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, n_iter=5).collect()
    }
    assert all(got[n] == 0 for n in range(4))
    assert all(got[n] == 10 for n in range(10, 14))


def test_label_propagation_differential_random(spark):
    import random

    from krnel_graph_spark.functions.graph import label_propagation

    rng = random.Random(7)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(120)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, n_iter=4).collect()
    }
    assert got == _lpa_ref(edges, 4)


def test_label_propagation_self_loops_dropped(spark):
    from krnel_graph_spark.functions.graph import label_propagation

    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 2)], "src long, dst long"
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, n_iter=3).collect()
    }
    # Only the 1-2 edge survives (self-loops contribute nothing), and a
    # single edge OSCILLATES under synchronous updates: each round the
    # two nodes swap labels, so after an odd round count both hold the
    # other's id — the textbook sync-LPA behavior the pure-Python
    # differential mirrors.
    assert got == {1: 2, 2: 1}
    assert got == _lpa_ref([(1, 1), (1, 2), (2, 2)], 3)


def test_label_propagation_string_ids(spark):
    """String node ids must work (r7 advice fix: the argmax negates the
    COUNT, not the label, so any orderable id type is legal); ties break
    to the lexicographically smallest label."""
    from krnel_graph_spark.functions.graph import label_propagation

    cl1 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    cl2 = [(a, b) for a in "wxyz" for b in "wxyz" if a < b]
    df = spark.createDataFrame(
        cl1 + cl2 + [("d", "w")], "src string, dst string"
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, n_iter=5).collect()
    }
    assert all(got[n] == "a" for n in "abcd")
    assert all(got[n] == "w" for n in "wxyz")
