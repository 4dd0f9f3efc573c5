"""Cluster-shape determinism: declared-query results must not depend on
the parallelism that computed them.

`tools/probe_determinism.py` sweeps all declared queries (recorded
bit-stable in SCALING.md round 6); this test pins the property for a
representative query per risk family, so a regression — a float fold
whose order leaks into the result, a limit without total order,
per-partition state — fails CI instead of waiting for the next sweep.

Shape B mirrors the probe: an odd shuffle-partition count forces
different fold groupings, AQE off removes coalescing/skew rewrites.
"""

from __future__ import annotations

import pytest

from biodata_pipeline_spark.operators.caching import cache_scope
from biodata_pipeline_spark.registry import SPARK_QUERIES
from tools.check_oracle import normalize

SF_DIR = "/root/testdata/sf0.001"
SHAPE_B = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.adaptive.enabled": "false",
}

# One query per determinism-risk family:
REPRESENTATIVES = [
    "q21_pricing_summary",    # float sum folds in a grouped agg
    "q_tfidf_top_terms",      # two hash aggs + ranked top-k (ties)
    "q_pca_projection",       # iterative float power iteration
    "q_corpus_shuffle",       # global ordering contract
    "q_shard_manifest",       # distributed prefix sum boundaries
    "q_line_dedup_scrub",     # collect_list reassembly order
]


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_result_is_invariant_to_cluster_shape(spark, name):
    defaults = {k: spark.conf.get(k) for k in SHAPE_B}
    with cache_scope():
        a = normalize(SPARK_QUERIES[name](spark, SF_DIR).toPandas())
    try:
        for k, v in SHAPE_B.items():
            spark.conf.set(k, v)
        with cache_scope():
            b = normalize(SPARK_QUERIES[name](spark, SF_DIR).toPandas())
    finally:
        for k, v in defaults.items():
            spark.conf.set(k, v)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    # exact equality, floats included: the engine's determinism rules
    # (sorted-order folds, round-before-rank) promise bit-stability,
    # not just closeness
    for c in a.columns:
        assert a[c].astype(str).equals(b[c].astype(str)), c
