"""Property test: the iterative min-label-propagation connected-components
operator agrees with a driver-side union-find ground truth on random
graphs — coverage beyond the single MinHash-LSH instance the oracle gate
checks (same role as tests/test_asof_property.py for the as-of join)."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from akka_streams_kinesis_spark.operators.curation import connected_components


def _union_find(n_nodes: set[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {v: v for v in n_nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # representative = component MIN id, matching the Spark operator
    comp: dict[int, list[int]] = {}
    for v in n_nodes:
        comp.setdefault(find(v), []).append(v)
    out = {}
    for members in comp.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def _random_graph(rnd: random.Random, n: int, m: int) -> list[tuple[int, int]]:
    edges = set()
    while len(edges) < m:
        a, b = rnd.randrange(n), rnd.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    return sorted(edges)


def test_cc_matches_union_find_on_random_graphs(spark):
    rnd = random.Random(7)
    # shapes chosen to exercise: sparse forest, dense near-clique blocks,
    # long chains (diameter >> 1 — the propagation's worst case)
    cases = [
        _random_graph(rnd, 60, 25),
        _random_graph(rnd, 40, 120),
        [(i, i + 1) for i in range(30)],           # one 31-node chain
        [(i, i + 1) for i in range(0, 20, 2)],     # 10 disjoint 2-cliques
    ]
    for edges in cases:
        nodes = {v for e in edges for v in e}
        want = _union_find(nodes, edges)
        df = spark.createDataFrame(edges, "src long, dst long")
        sym = df.unionAll(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        got = {
            r["doc_id"]: r["rep"] for r in connected_components(sym).collect()
        }
        assert got == want


def test_cc_power_law_giant_component(spark):
    """Skew guard (round-2 verdict #6): a power-law graph — preferential
    attachment, so one giant component holds ~95% of nodes and hub degrees
    follow a heavy tail — must still converge inside the default round cap
    and match union-find. This is the component-size distribution a
    boilerplate-heavy corpus feeds into dedup_cluster_components through
    the capped band join; per-round group sizes in the propagation are
    bounded by node DEGREE (messages group by doc_id), never by component
    size, which is why the giant component is safe."""
    rnd = random.Random(13)
    n = 3000
    edges: list[tuple[int, int]] = [(0, 1)]
    targets = [0, 1]  # degree-weighted sampling pool
    for v in range(2, n):
        u = targets[rnd.randrange(len(targets))]
        edges.append((min(u, v), max(u, v)))
        targets.extend((u, v))
    # plus a sprinkle of small components and a medium chain
    base = n
    for c in range(50):
        a = base + 2 * c
        edges.append((a, a + 1))
    chain0 = base + 200
    edges.extend((chain0 + i, chain0 + i + 1) for i in range(25))

    nodes = {v for e in edges for v in e}
    want = _union_find(nodes, edges)
    giant = sum(1 for r in want.values() if r == 0)
    assert giant >= 0.9 * n  # the generator really made a giant component

    df = spark.createDataFrame(edges, "src long, dst long")
    sym = df.unionAll(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    got = {r["doc_id"]: r["rep"] for r in connected_components(sym).collect()}
    assert got == want


def test_cc_star_converges_in_constant_rounds(spark):
    """The band-cap (dedup.py) emits STAR edges for over-cap buckets; a
    5000-leaf star must converge in O(1) rounds — every leaf is one hop
    from the min — so cap-capped mega-buckets never stress the round cap."""
    edges = [(0, i) for i in range(1, 5001)]
    df = spark.createDataFrame(edges, "src long, dst long")
    sym = df.unionAll(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    got = connected_components(sym, max_rounds=3).collect()
    assert len(got) == 5001
    assert all(r["rep"] == 0 for r in got)


def test_cc_long_chain_converges_within_round_cap(spark):
    # a 41-node path has diameter 40 — more than the 20-round cap, so this
    # only converges because of the pointer-jumping (rep-of-rep) term;
    # plain one-hop propagation would need 40 rounds and raise
    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "src long, dst long")
    sym = df.unionAll(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    got = connected_components(sym).collect()
    assert all(r["rep"] == 0 for r in got)
    assert len(got) == 41
