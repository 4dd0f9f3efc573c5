"""Connected components vs a Python union-find oracle; end-to-end dedup
survivors over MinHash pair edges."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from biodata_pipeline_spark.operators.clusters import (
    connected_components,
    dedup_survivors,
)


def union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min member of each set
    comp = {}
    for v in list(parent):
        comp[v] = find(v)
    return comp


def test_components_simple_chain_and_triangle(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)], ["id_a", "id_b"]
    )
    got = {r.id: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 10_000))
def test_components_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = rng.randint(2, 40)
    m = rng.randint(1, 60)
    edges = [(rng.randint(0, n), rng.randint(0, n)) for _ in range(m)]
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        edges = [(0, 1)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == union_find(edges)


def test_unconverged_chain_raises_not_silent_wrong_labels(spark):
    """A graph needing more rounds than the budget must raise —
    unconverged labels would keep multiple 'survivors' from one cluster
    with no signal. With the default budget the same chain converges
    (star contraction: O(log² n) rounds, so even a 100-deep chain is
    comfortably inside 20)."""
    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], ["id_a", "id_b"]
    )
    # small_graph_edges=0 forces the iterative path (the union-find
    # shortcut would solve a 100-edge chain in one job, never iterating)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iterations=1, small_graph_edges=0)
    got = {
        r.id: r.component
        for r in connected_components(chain, small_graph_edges=0).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == 101


def test_self_loop_only_vertices_map_to_themselves(spark):
    edges = spark.createDataFrame(
        [(5, 5), (1, 2), (7, 7)], ["id_a", "id_b"]
    )
    got = {r.id: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 5: 5, 7: 7}


def test_dedup_survivors_end_to_end(spark, sf_dir):
    from biodata_pipeline_spark.operators.dedup import minhash_lsh_dup_pairs
    from biodata_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_dup_pairs(docs, threshold=0.5)
    kept = dedup_survivors(docs, pairs)
    n_docs, n_kept = docs.count(), kept.count()
    n_losers = (
        connected_components(pairs).filter(F.col("id") != F.col("component")).count()
    )
    assert n_kept == n_docs - n_losers
    assert 0 < n_kept <= n_docs
    # survivors contain every cluster representative
    reps = {
        r.component
        for r in connected_components(pairs).select("component").distinct().collect()
    }
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert reps <= kept_ids


def test_components_preserve_id_type_across_strategy_switch(spark):
    """ADVICE r5: the union-find shortcut must not hardcode long ids —
    string ids work, and both strategy paths emit the SAME schema."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["id_a", "id_b"]
    )
    small = connected_components(edges)  # union-find path
    big = connected_components(edges, small_graph_edges=0)  # star path
    assert small.schema == big.schema
    got_small = {r.id: r.component for r in small.collect()}
    got_big = {r.id: r.component for r in big.collect()}
    assert got_small == got_big == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_components_int_ids_keep_int_type_on_shortcut(spark):
    edges = spark.createDataFrame(
        [(1, 2)], "id_a int, id_b int"
    )
    out = connected_components(edges)
    assert out.schema["id"].dataType.simpleString() == "int"
    assert out.schema["component"].dataType.simpleString() == "int"
