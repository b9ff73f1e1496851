"""connected_components vs a python union-find oracle."""

from __future__ import annotations

import random

from crawlspark import graph


def _uf_components(pairs: list[tuple]) -> dict:
    """Union-find oracle: node -> min-id of its component."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_members: dict = {}
    for n in list(parent):
        comp_members.setdefault(find(n), []).append(n)
    out = {}
    for members in comp_members.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in graph.connected_components(df).collect()}
    assert got == _uf_components(pairs)


def test_chain_worst_case_for_label_propagation(spark):
    # a 60-node path has diameter 59; large-star/small-star must still
    # converge inside its O(log^2 n) bound, far under max_rounds
    _run(spark, [(i, i + 1) for i in range(60)])


def test_two_cliques_and_a_bridge_pair(spark):
    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    pairs += [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    pairs += [(100, 101)]
    _run(spark, pairs)


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for _ in range(4):
        n = rng.randint(5, 40)
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randint(1, 60))
        ]
        pairs = [p for p in pairs if p[0] != p[1]] or [(0, 1)]
        _run(spark, pairs)


def test_string_ids_lexicographic_label(spark):
    df = spark.createDataFrame(
        [("doc_b", "doc_a"), ("doc_b", "doc_c"), ("zzz", "yyy")],
        "id_a string, id_b string",
    )
    got = {r["node"]: r["component"] for r in graph.connected_components(df).collect()}
    assert got == {
        "doc_a": "doc_a",
        "doc_b": "doc_a",
        "doc_c": "doc_a",
        "yyy": "yyy",
        "zzz": "yyy",
    }


def test_empty_and_self_loop_only(spark):
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert graph.connected_components(empty).count() == 0
    loops = spark.createDataFrame([(3, 3)], "id_a long, id_b long")
    assert graph.connected_components(loops).count() == 0
