"""Session-timezone-proofness of the declared temporal surface.

The driver supplies its OWN SparkSession; nothing guarantees it runs
UTC. Declared queries ship timestamps as epoch milliseconds, which must
be identical under any session timezone. Round 6 found a real leak:
Spark 4.1 reads the events table's TIMESTAMP(NANOS) as TIMESTAMP_NTZ
(the nanosAsLong legacy conf no longer takes effect), and the loader's
NTZ→TIMESTAMP cast interpreted the wall clock in the SESSION zone — a
5-hour shift for every downstream epoch under America/New_York, green
only because every harness session happened to be UTC. A second,
mutually-cancelling bug sat in q_upsert_latest (ntz_epoch_ms on the
already-absolute TIMESTAMP coerces back through NTZ in the session
zone). Both are fixed by tz-free NTZ arithmetic in the loader
(sources/tables.py) + unix_millis downstream; this test pins them by
flipping the session timezone at runtime (``spark.sql.session.timeZone``
is a runtime conf — exactly how a non-UTC driver would differ).
"""

from __future__ import annotations

import pytest

from biodata_pipeline_spark.operators.caching import cache_scope
from biodata_pipeline_spark.registry import SPARK_QUERIES

SF = "/root/testdata/sf0.001"

TEMPORAL = [
    "q16_asof_join",
    "q28_lag_prev_event",
    "q29_sliding_frame_avg",
    "q35_tumbling_window",
    "q35b_cascade_hourly",
    "q36_sliding_window",
    "q37_session_window",
    "q_upsert_latest",
    "q30_orderby_limit_topk",
    "q_corpus_diff",
]


@pytest.mark.parametrize("name", TEMPORAL)
def test_query_is_session_timezone_proof(spark, name):
    key = "spark.sql.session.timeZone"
    original = spark.conf.get(key)

    def run():
        with cache_scope():
            df = SPARK_QUERIES[name](spark, SF)
            return sorted(map(tuple, df.collect())), df.schema

    try:
        spark.conf.set(key, "UTC")
        utc_rows, utc_schema = run()
        # half-hour offset + southern hemisphere DST: the nastiest zone
        spark.conf.set(key, "Australia/Adelaide")
        adl_rows, adl_schema = run()
    finally:
        spark.conf.set(key, original)
    assert utc_schema == adl_schema
    assert utc_rows == adl_rows, f"{name} output depends on session timezone"
