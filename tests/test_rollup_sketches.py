"""Cascading rollups (each level from the previous == direct from raw) and
count-min sketch guarantees (never underestimates; near-exact for heavy keys)."""

from __future__ import annotations

from pyspark.sql import functions as F

from biodata_pipeline_spark.operators.rollup import base_rollup, cascade_rollup
from biodata_pipeline_spark.operators.sketches import cms_build, cms_lookup
from biodata_pipeline_spark.sources.tables import load_table


def test_cascade_levels_match_direct_aggregation(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    levels = cascade_rollup(events, ("1 minute", "1 hour", "1 day"))

    for dur in ("1 hour", "1 day"):
        cascaded = {
            r.bucket: (r.n_events, round(r.sum_value, 6), r.min_value, r.max_value)
            for r in levels[dur].collect()
        }
        direct = {
            r.bucket: (r.n_events, round(r.sum_value, 6), r.min_value, r.max_value)
            for r in base_rollup(events, dur).collect()
        }
        assert set(cascaded) == set(direct)
        for b in direct:
            c, d = cascaded[b], direct[b]
            assert c[0] == d[0] and c[2] == d[2] and c[3] == d[3]
            assert abs(c[1] - d[1]) < 1e-6  # float sums regroup, same value

    # totals conserve across every level
    n_raw = events.count()
    for df in levels.values():
        assert df.agg(F.sum("n_events")).collect()[0][0] == n_raw


def test_cms_never_underestimates_and_is_tight_for_heavy_keys(spark):
    rows = [("heavy",)] * 500 + [(f"k{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, ["key"])
    sketch = cms_build(df, "key", depth=4, width=1024)
    keys = df.select("key").distinct()
    est = {r.key: r.est_count for r in cms_lookup(sketch, keys, "key").collect()}
    exact = {r.key: r.cnt for r in df.groupBy("key").agg(F.count("*").alias("cnt")).collect()}
    assert all(est[k] >= exact[k] for k in exact)  # CMS never underestimates
    assert est["heavy"] == 500  # heavy key exact at this fill factor (700/1024)
    # absent key estimates 0
    missing = spark.createDataFrame([("nope",)], ["key"])
    assert cms_lookup(sketch, missing, "key").collect()[0].est_count == 0
    # sketch size is bounded by d*w regardless of input size
    assert sketch.count() <= 4 * 1024
