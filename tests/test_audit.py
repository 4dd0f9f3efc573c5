"""Recall audits: the md5-hash-family twins of the approximate dedup
operators, plus their structural guarantees.

These tests pin the properties the oracle hash rows rely on:
 - the LSH audit's recall at high thresholds is high (the planted
   near-dup pairs ARE found), and found+missed == true pairs;
 - the SimHash pigeonhole audit finds EVERY pair (recall == 1 is an
   equality in the d < n_bands regime, not a bound);
 - the CC audit's components agree with a driver-side union-find;
 - the ANN bucket audit emits one row per query with a valid top-1.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biodata_pipeline_spark.operators.audit import (
    ann_bucket_recall_audit,
    md5_int60,
    minhash_candidate_pairs_md5,
    minhash_recall_audit,
    simhash_recall_audit,
)
from biodata_pipeline_spark.sources.tables import load_table

SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF001, "documents")


def test_md5_int60_matches_duckdb(spark):
    """The cross-engine hash contract: Spark's conv(md5[:15],16,10)
    equals DuckDB's CAST('0x'||md5[:15] AS BIGINT) on the same input."""
    import duckdb

    vals = ["", "a", "hello world", "0:the quick brown", "ünïcødé"]
    got = (
        spark.createDataFrame([(v,) for v in vals], "s string")
        .select(md5_int60(F.col("s")).alias("h"))
        .collect()
    )
    con = duckdb.connect()
    for v, row in zip(vals, got):
        (want,) = con.execute(
            "SELECT CAST('0x' || substring(md5(?), 1, 15) AS BIGINT)", [v]
        ).fetchone()
        assert row.h == want, v


def test_minhash_audit_counts_are_consistent(spark, docs):
    rows = {r.threshold: r for r in minhash_recall_audit(docs).collect()}
    assert set(rows) == {0.5, 0.7, 0.8, 0.9}
    for r in rows.values():
        assert r.n_found + r.n_missed == r.n_true_pairs
        assert 0.0 <= r.recall <= 1.0
    # the sf0.01 corpus plants 25 pairs at jaccard >= 0.9; banding with
    # 8 bands x 4 rows at s=0.9 has per-pair hit probability
    # 1-(1-0.9^4)^8 ~ 0.9997 — the md5 family is fixed, so this recall
    # is a constant of the dataset, pinned here at its observed value 1
    assert rows[0.9].n_true_pairs == 25
    assert rows[0.9].recall == 1.0


def test_simhash_pigeonhole_recall_is_exactly_one(spark, docs):
    out = simhash_recall_audit(docs).collect()
    assert len(out) > 0, "expected near-dup pairs at Hamming <= 3"
    assert all(r.found == 1 for r in out), [r for r in out if r.found == 0]
    assert all(r.hamming <= 3 for r in out)


def test_lsh_candidates_are_ordered_distinct_pairs(spark, docs):
    sample = docs.filter(F.col("doc_id") < 200)
    cand = minhash_candidate_pairs_md5(sample).collect()
    pairs = [(r.id_a, r.id_b) for r in cand]
    assert len(pairs) == len(set(pairs))
    assert all(a < b for a, b in pairs)


def test_cc_audit_matches_union_find(spark, docs):
    """Star-contraction components == driver-side union-find over the
    same exact-Jaccard edge set. small_graph_edges=0 forces the
    DISTRIBUTED star-contraction path, so this pins the two strategies
    of the observed-size switch against each other."""
    from biodata_pipeline_spark.operators.clusters import connected_components
    from biodata_pipeline_spark.operators.dedup import ngram_jaccard_dup_pairs

    edges = ngram_jaccard_dup_pairs(docs, 0.5)
    got = {
        r.id: r.component
        for r in connected_components(edges, small_graph_edges=0).collect()
    }
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for e in edges.collect():
        ra, rb = find(e.id_a), find(e.id_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want


def test_audit_persists_are_scope_released(spark, docs):
    """The audit's operator-internal persists (shared shingles, bands,
    hits) register with cache_scope so library callers can release them
    — the round-4 ADVICE contract."""
    from biodata_pipeline_spark.operators.caching import cache_scope

    sample = docs.filter(F.col("doc_id") < 120)
    with cache_scope() as frames:
        minhash_recall_audit(sample).collect()
        assert len(frames) == 3  # shingles, bands, hits
        assert all(f.storageLevel.useMemory for f in frames)
    assert all(not f.storageLevel.useMemory for f in frames)


def test_affine_lanes_separate_half_collisions():
    """Regression for the r9 ADVICE base-hash-width item: with ONE
    shared 31-bit base hash, two shingles colliding in it merged in
    EVERY lane. The widened family hashes the (h1, h2) pair — a
    collision in one half must not merge any lane (b_i != 0 mod p, so
    b_i*Δh2 != 0 for every lane), and intermediates stay within int64
    on both engines."""
    from biodata_pipeline_spark.operators.audit import (
        MINHASH_P as p,
        minhash_affine_params,
    )

    a, b, c = minhash_affine_params(32)
    assert all(1 <= ai <= p - 1 for ai in a)
    assert all(1 <= bi <= p - 1 for bi in b)
    assert all(0 <= ci < p for ci in c)
    h1, h2a, h2b = 123456789, 42, 987654321  # h1 collides, h2 differs
    for i in range(32):
        la = ((a[i] * h1) % p + (b[i] * h2a) % p + c[i]) % p
        lb = ((a[i] * h1) % p + (b[i] * h2b) % p + c[i]) % p
        assert la != lb, f"lane {i} merged on an h1-only collision"
        # int64 headroom: each product < 2^62, reduced sum < 3p < 2^33
        assert a[i] * (p - 1) < (1 << 62) and b[i] * (p - 1) < (1 << 62)


def test_md5_int60_range_property(spark):
    """Property: md5_int60 is always in [0, 2^60) — the bit budget the
    SimHash bands and minhash lanes rely on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import duckdb

    con = duckdb.connect()

    @given(st.text(max_size=50))
    @settings(max_examples=200, deadline=None)
    def check(s):
        (v,) = con.execute(
            "SELECT CAST('0x' || substring(md5(?), 1, 15) AS BIGINT)", [s]
        ).fetchone()
        assert 0 <= v < (1 << 60)

    check()


def test_lsh_pair_recall_audit_counts_consistent(spark):
    from biodata_pipeline_spark.operators.audit import lsh_pair_recall_audit

    emb = load_table(spark, SF001, "embeddings")
    rows = {r.threshold: r for r in lsh_pair_recall_audit(emb).collect()}
    assert set(rows) == {0.25, 0.5, 0.75}
    for r in rows.values():
        assert r.n_found + r.n_missed == r.n_true_pairs
        assert 0.0 <= r.recall <= 1.0
    # monotone: higher-threshold true sets are subsets
    assert rows[0.75].n_true_pairs <= rows[0.5].n_true_pairs <= rows[0.25].n_true_pairs


def test_ann_bucket_audit_shape(spark):
    emb = load_table(spark, SF001, "embeddings")
    out = ann_bucket_recall_audit(emb, n_queries=20).collect()
    assert len(out) == 20
    assert all(r.top1_id != r.query_id for r in out)
    assert all(r.same_bucket in (0, 1) for r in out)
    assert all(-1.0 <= r.sim <= 1.0 for r in out)


def test_audit_arg_validation(spark, docs):
    import pytest

    from biodata_pipeline_spark.operators.audit import lsh_pair_recall_audit

    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_recall_audit(docs, max_hamming=5, n_bands=4)
    with pytest.raises(ValueError, match="threshold"):
        minhash_recall_audit(docs, thresholds=())
    with pytest.raises(ValueError, match="divide"):
        lsh_pair_recall_audit(docs, sign_dims=10, n_bands=4)
