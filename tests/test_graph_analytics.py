"""Brute-force oracles for openie_spark.graph_analytics: k-hop BFS vs a
pure-Python frontier walk, triangle counts vs direct enumeration over a
seeded random graph, plus shape edge cases (empty frontier early-stop,
k=0, directed vs undirected, self-loops/duplicate edges collapsed)."""

import random
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from openie_spark.graph_analytics import (
    clustering_coefficients,
    hits_micros,
    k_hop_neighborhood,
    pagerank_micros,
    triangle_count,
)


def _random_edges(rng, n_nodes, n_edges):
    return [
        (rng.randrange(n_nodes), rng.randrange(n_nodes))
        for _ in range(n_edges)
    ]


def _bfs(edges, seeds, k, directed):
    adj = defaultdict(set)
    for u, v in edges:
        if u == v:
            continue
        adj[u].add(v)
        if not directed:
            adj[v].add(u)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for d in range(1, k + 1):
        frontier = {
            w for u in frontier for w in adj[u] if w not in dist
        }
        for w in frontier:
            dist[w] = d
    return dist


def _triangles(edges):
    und = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    adj = defaultdict(set)
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    per_node = defaultdict(int)
    for u, v in und:
        for w in adj[u] & adj[v]:
            # each triangle seen once per edge => per node twice; use the
            # canonical u<v<w check instead
            if w > v:
                per_node[u] += 1
                per_node[v] += 1
                per_node[w] += 1
    return dict(per_node)


def test_k_hop_matches_python_bfs(spark):
    rng = random.Random(7)
    edges = _random_edges(rng, 40, 120) + [(3, 3), (5, 9), (5, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for directed in (False, True):
        for k in (0, 1, 3):
            got = {
                r["node"]: r["dist"]
                for r in k_hop_neighborhood(
                    df, [0, 17], k, directed=directed
                ).collect()
            }
            assert got == _bfs(edges, [0, 17], k, directed), (directed, k)


def test_k_hop_early_stop_and_string_nodes(spark):
    # a 3-chain: BFS at k=10 must stop after the graph is exhausted
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    got = {
        r["node"]: r["dist"]
        for r in k_hop_neighborhood(df, ["a"], 10).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2}
    # directed: c unreachable backwards
    got = {
        r["node"]: r["dist"]
        for r in k_hop_neighborhood(df, ["c"], 10, directed=True).collect()
    }
    assert got == {"c": 0}
    with pytest.raises(ValueError):
        k_hop_neighborhood(df, ["a"], -1)


def test_triangle_count_matches_enumeration(spark):
    rng = random.Random(13)
    for trial, (n, m) in enumerate([(12, 30), (30, 120), (8, 6)]):
        edges = _random_edges(rng, n, m)
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["triangles"]
            for r in triangle_count(df).collect()
        }
        assert got == _triangles(edges), trial
    # direction/duplicates collapse: a triangle given twice in both
    # orientations plus a self-loop still counts once per node
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 1)],
        "src long, dst long",
    )
    got = {
        r["node"]: r["triangles"] for r in triangle_count(df).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


def _pagerank_int(edges, iterations, damping_pct=85, seeds=None):
    """The exact integer recurrence pagerank_micros promises, over
    dicts: contribution = rank // outdeg, dangling mass // n shared
    uniformly, damped with integer // 100. Bit-for-bit comparable."""
    e = sorted({(u, v) for u, v in edges if u != v})
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(nodes)
    if n == 0:
        return {}
    out = defaultdict(list)
    for u, v in e:
        out[u].append(v)
    tset = set(nodes) if seeds is None else set(seeds) & set(nodes)
    tn = len(tset)
    base = 1_000_000 // tn
    tele = ((100 - damping_pct) * 1_000_000 // 100) // tn
    rank = {v: (base if v in tset else 0) for v in nodes}
    for _ in range(iterations):
        in_sum = defaultdict(int)
        for u, vs in out.items():
            c = rank[u] // len(vs)
            for v in vs:
                in_sum[v] += c
        dang = sum(rank[v] for v in nodes if v not in out)
        rank = {
            v: (tele if v in tset else 0)
            + (
                damping_pct
                * (in_sum.get(v, 0) + (dang // tn if v in tset else 0))
            )
            // 100
            for v in nodes
        }
    return rank


def test_pagerank_micros_matches_integer_recurrence(spark):
    rng = random.Random(21)
    # random digraph with guaranteed dangling sinks + dup/self edges
    edges = _random_edges(rng, 25, 80) + [(4, 4), (0, 30), (1, 31)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for iters in (0, 1, 4):
        got = {
            r["node"]: r["rank_micros"]
            for r in pagerank_micros(df, iterations=iters).collect()
        }
        assert got == _pagerank_int(edges, iters), iters
    # mass is conserved up to sub-micro flooring: never grows, and each
    # iteration drops < n micros per floor site (contribs, dangling,
    # teleport, damping) — assert the documented loose bound
    n = len(got)
    total = sum(got.values())
    assert total <= 1_000_000
    assert total > 1_000_000 - 4 * (3 * n + 200)


def test_personalized_pagerank_matches_integer_recurrence(spark):
    """seeds= switches teleport/dangling/init to the seed set; exact
    vs the dict recurrence; absent seeds ignored; all-absent raises;
    non-seed sinks still drain into the seeds via dangling mass."""
    rng = random.Random(29)
    edges = _random_edges(rng, 25, 80)
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = [0, 7, 999]  # 999 not in the graph -> ignored
    got = {
        r["node"]: r["rank_micros"]
        for r in pagerank_micros(df, iterations=4, seeds=seeds).collect()
    }
    assert got == _pagerank_int(edges, 4, seeds=seeds)
    # seeds hold most of the mass at strong damping of a sparse graph
    assert got[0] + got[7] > 200_000
    with pytest.raises(ValueError):
        pagerank_micros(df, iterations=2, seeds=[777]).collect()


def test_pagerank_micros_shapes(spark):
    # pure self-loop graph -> no nodes survive -> empty frame, right cols
    df = spark.createDataFrame([(1, 1)], "src long, dst long")
    out = pagerank_micros(df, iterations=3)
    assert out.columns == ["node", "rank_micros"]
    assert out.count() == 0
    # star: hub a -> {b,c,d}; all leaves dangling; leaves tie exactly
    df = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d")], "src string, dst string"
    )
    got = {
        r["node"]: r["rank_micros"]
        for r in pagerank_micros(df, iterations=6).collect()
    }
    assert got == _pagerank_int(
        [("a", "b"), ("a", "c"), ("a", "d")], 6
    )
    assert got["b"] == got["c"] == got["d"]
    with pytest.raises(ValueError):
        pagerank_micros(df, iterations=-1)


def test_pagerank_micros_partition_layout_independent(spark):
    """The operator's whole contract: integer arithmetic makes the
    result identical under any shuffle layout."""
    rng = random.Random(5)
    edges = _random_edges(rng, 40, 160)
    df = spark.createDataFrame(edges, "src long, dst long")
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        one = sorted(
            (r["node"], r["rank_micros"])
            for r in pagerank_micros(df, iterations=3).collect()
        )
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        many = sorted(
            (r["node"], r["rank_micros"])
            for r in pagerank_micros(df, iterations=3).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert one == many
    assert one == sorted(_pagerank_int(edges, 3).items())


def test_clustering_coefficients_brute_force(spark):
    """clustering_coefficients vs direct enumeration: degree, wedges =
    C(deg,2), triangles per node, coeff_micros = floor(1e6*tri/wedges);
    triangle-free and degree-1 nodes present with coeff 0."""
    rng = random.Random(17)
    edges = _random_edges(rng, 20, 60) + [(2, 2), (18, 19)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (
            r["degree"], r["triangles"], r["wedges"], r["coeff_micros"]
        )
        for r in clustering_coefficients(df).collect()
    }
    und = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    adj = defaultdict(set)
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    tri = _triangles(edges)
    want = {}
    for n, nbrs in adj.items():
        d = len(nbrs)
        w = d * (d - 1) // 2
        t = tri.get(n, 0)
        want[n] = (d, t, w, (1_000_000 * t) // w if w else 0)
    assert got == want
    # a pure triangle: every node coeff exactly 1.0
    k3 = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    for r in clustering_coefficients(k3).collect():
        assert (r["degree"], r["triangles"], r["wedges"],
                r["coeff_micros"]) == (2, 1, 1, 1_000_000)


def test_triangle_count_plan_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, (i * 7 + 1) % 50) for i in range(50)], "src long, dst long"
    )
    plan = triangle_count(df)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    final = plan.split("== Initial Plan ==")[0]
    assert "Cartesian" not in final, final[:2000]
    assert "BatchEvalPython" not in final

def _hits_int(edges, iterations):
    """The exact integer recurrence hits_micros promises, over dicts:
    propagate-and-L1-rescale with `den = max(1, total // 1e6)` and
    floor division, Gauss-Seidel ordering (hub sweep uses the
    just-rescaled auth). Bit-for-bit comparable."""
    e = sorted({(u, v) for u, v in edges if u != v})
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    out = defaultdict(list)
    inn = defaultdict(list)
    for u, v in e:
        out[u].append(v)
        inn[v].append(u)
    hub = {v: 1_000_000 for v in nodes}
    auth = {v: 0 for v in nodes}
    for _ in range(iterations):
        raw = {v: sum(hub[u] for u in inn[v]) for v in nodes}
        den = max(1, sum(raw.values()) // 1_000_000)
        auth = {v: raw[v] // den for v in nodes}
        raw = {v: sum(auth[w] for w in out[v]) for v in nodes}
        den = max(1, sum(raw.values()) // 1_000_000)
        hub = {v: raw[v] // den for v in nodes}
    return {v: (auth[v], hub[v]) for v in nodes}


def test_hits_micros_matches_integer_recurrence(spark):
    rng = random.Random(33)
    # random digraph + pure sources, pure sinks, dup/self edges
    edges = _random_edges(rng, 25, 80) + [(4, 4), (40, 3), (3, 41)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for iters in (0, 1, 4):
        got = {
            r["node"]: (r["auth_micros"], r["hub_micros"])
            for r in hits_micros(df, iterations=iters).collect()
        }
        assert got == _hits_int(edges, iters), iters


def test_hits_micros_hub_auth_separation(spark):
    """Bipartite star: one directory page linking to three content
    pages. The directory must end all-hub/no-auth, the content pages
    all-auth/no-hub, leaves tie exactly."""
    edges = [("dir", "p1"), ("dir", "p2"), ("dir", "p3")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: (r["auth_micros"], r["hub_micros"])
        for r in hits_micros(df, iterations=4).collect()
    }
    assert got == _hits_int(edges, 4)
    assert got["dir"][0] == 0 and got["dir"][1] >= 999_999
    assert got["p1"] == got["p2"] == got["p3"]
    assert got["p1"][1] == 0 and got["p1"][0] >= 333_333
    with pytest.raises(ValueError):
        hits_micros(df, iterations=-1)


def test_hits_micros_partition_layout_independent(spark):
    rng = random.Random(9)
    edges = _random_edges(rng, 40, 160)
    df = spark.createDataFrame(edges, "src long, dst long")
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        one = sorted(
            (r["node"], r["auth_micros"], r["hub_micros"])
            for r in hits_micros(df, iterations=3).collect()
        )
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        many = sorted(
            (r["node"], r["auth_micros"], r["hub_micros"])
            for r in hits_micros(df, iterations=3).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert one == many
    assert one == sorted(
        (v, a, h) for v, (a, h) in _hits_int(edges, 3).items()
    )

def test_bipartite_project_brute_force_and_cap(spark):
    """bipartite_project vs a python set replay: duplicate relation
    rows collapse, co-counts exact, min_co filters, and the
    max_right_degree cap drops hub right-values BEFORE pairing."""
    from collections import Counter

    from openie_spark.graph_analytics import bipartite_project

    rows = [
        ("u1", "a"), ("u1", "a"),       # dup collapses
        ("u2", "a"), ("u3", "a"),
        ("u1", "b"), ("u2", "b"),
        ("u1", "c"), ("u2", "c"), ("u3", "c"), ("u4", "c"),  # hub value
    ]
    df = spark.createDataFrame(rows, "l string, r string")

    def ref(cap):
        rel = set(rows)
        deg = Counter(r for _, r in rel)
        co = Counter()
        for u, r in rel:
            for v, r2 in rel:
                if r == r2 and u < v and (cap is None or deg[r] <= cap):
                    co[(u, v)] += 1
        return dict(co)

    got = {
        (r["src"], r["dst"]): r["co"]
        for r in bipartite_project(df, "l", "r").collect()
    }
    assert got == ref(None)
    got_cap = {
        (r["src"], r["dst"]): r["co"]
        for r in bipartite_project(
            df, "l", "r", max_right_degree=3
        ).collect()
    }
    assert got_cap == ref(3)
    assert ("u3", "u4") not in got_cap  # only shared the hub value
    got_min = {
        (r["src"], r["dst"]): r["co"]
        for r in bipartite_project(df, "l", "r", min_co=2).collect()
    }
    assert got_min == {k: v for k, v in ref(None).items() if v >= 2}

    import pytest as _pytest
    with _pytest.raises(ValueError):
        bipartite_project(df, "l", "r", min_co=0)

def _pagerank_int_weighted(edges_w, iterations, damping_pct=85):
    """Weighted variant of _pagerank_int: edges_w is [(u, v, w)];
    parallel edges sum their weights; contribution =
    (rank * w) // sum_w(u)."""
    from collections import defaultdict as dd

    agg = dd(int)
    for u, v, w in edges_w:
        if u != v:
            agg[(u, v)] += w
    agg = {k: w for k, w in agg.items() if w > 0}
    nodes = sorted({u for u, _ in agg} | {v for _, v in agg})
    n = len(nodes)
    if n == 0:
        return {}
    out = dd(list)
    for (u, v), w in agg.items():
        out[u].append((v, w))
    wsum = {u: sum(w for _, w in vs) for u, vs in out.items()}
    base = 1_000_000 // n
    tele = ((100 - damping_pct) * 1_000_000 // 100) // n
    rank = {v: base for v in nodes}
    for _ in range(iterations):
        in_sum = dd(int)
        for u, vs in out.items():
            for v, w in vs:
                in_sum[v] += (rank[u] * w) // wsum[u]
        dang = sum(rank[v] for v in nodes if v not in out)
        rank = {
            v: tele + (damping_pct * (in_sum.get(v, 0) + dang // n)) // 100
            for v in nodes
        }
    return rank


def test_weighted_pagerank_matches_integer_recurrence(spark):
    """weight_col: parallel-edge weight aggregation, proportional mass
    split, zero/negative aggregate weights dropped; w=1 everywhere
    equals the unweighted operator exactly."""
    rng = random.Random(61)
    edges_w = [
        (rng.randrange(20), rng.randrange(20), rng.randrange(1, 6))
        for _ in range(70)
    ] + [(1, 2, 3), (1, 2, 2), (5, 5, 9), (3, 4, 0)]
    df = spark.createDataFrame(edges_w, "src long, dst long, w long")
    got = {
        r["node"]: r["rank_micros"]
        for r in pagerank_micros(
            df, iterations=4, weight_col="w"
        ).collect()
    }
    assert got == _pagerank_int_weighted(edges_w, 4)

    # w=1 on the DEDUPED pair set (per-row 1s on parallel edges would
    # legitimately sum to >1 and split mass differently)
    ones = (
        df.select("src", "dst").distinct().withColumn("w", F.lit(1))
    )
    got_w1 = {
        r["node"]: r["rank_micros"]
        for r in pagerank_micros(ones, iterations=3, weight_col="w").collect()
    }
    got_un = {
        r["node"]: r["rank_micros"]
        for r in pagerank_micros(df, iterations=3).collect()
    }
    assert got_w1 == got_un

def test_digraph_stats_brute_force(spark):
    """digraph_stats vs a python replay on a random digraph with
    planted reciprocal pairs, self-loops, and duplicates."""
    from collections import Counter

    from openie_spark.graph_analytics import digraph_stats

    rng = random.Random(67)
    edges = _random_edges(rng, 15, 60) + [
        (1, 2), (2, 1), (3, 3), (4, 5), (4, 5),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    e = {(u, v) for u, v in edges if u != v}
    od = Counter(u for u, _ in e)
    idg = Counter(v for _, v in e)
    nodes = {u for u, _ in e} | {v for _, v in e}
    recip = sum(1 for (u, v) in e if (v, u) in e)
    r = digraph_stats(df).collect()[0]
    assert r["n_nodes"] == len(nodes)
    assert r["n_edges"] == len(e)
    assert r["n_reciprocal"] == recip
    assert r["max_out_degree"] == max(od.values())
    assert r["max_in_degree"] == max(idg.values())
    assert r["sum_out_sq"] == sum(d * d for d in od.values())
    assert r["sum_du"] == sum(od[u] for u, _ in e)
    assert r["sum_dv"] == sum(idg[v] for _, v in e)
    assert r["sum_dudv"] == sum(od[u] * idg[v] for u, v in e)
    assert r["sum_du2"] == sum(od[u] ** 2 for u, _ in e)
    assert r["sum_dv2"] == sum(idg[v] ** 2 for _, v in e)
    assert (1, 2) in e and (2, 1) in e and recip >= 2

def test_k_core_brute_force(spark):
    """k_core vs a python peel on random graphs: the fixpoint is the
    maximal subgraph with min degree >= k; empty cores come back
    empty; k=1 drops only isolated self-loop nodes."""
    def peel(edges, k):
        und = {(min(u, v), max(u, v)) for u, v in edges if u != v}
        while True:
            deg = defaultdict(int)
            for u, v in und:
                deg[u] += 1
                deg[v] += 1
            bad = {n for n, d in deg.items() if d < k}
            if not bad:
                return dict(deg)
            und = {
                (u, v) for u, v in und if u not in bad and v not in bad
            }

    from openie_spark.graph_analytics import k_core

    rng = random.Random(71)
    for trial, (n, m, k) in enumerate([(20, 60, 3), (30, 50, 2), (10, 8, 4)]):
        edges = _random_edges(rng, n, m)
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["degree"] for r in k_core(df, k).collect()
        }
        assert got == peel(edges, k), trial

    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    assert k_core(df, 5).count() == 0
    with pytest.raises(ValueError):
        k_core(df, 0)
