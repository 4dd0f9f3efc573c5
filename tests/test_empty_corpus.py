"""Every declared query must survive an EMPTY corpus slice.

At 100 TB an empty slice is routine — a new day-partition, a source
with no documents yet, a filter that matches nothing — and ANSI mode
(div0, element_at OOB, overflow all throw) plus eager driver-side fits
make "works on data, crashes on nothing" a real failure class. This
sweep builds zero-row replicas of every table with the EXACT production
Arrow schemas (including events' TIMESTAMP(NANOS) — a Spark-written
empty frame would silently change it) and runs the full declared
surface. Found on first run: similarity_join_vectorized unpacked the
shape of an empty matrix; kmeans/PCA queries crashed in their eager
fits (now translated to empty frames with the production schema by
registry.vector._empty_fallback).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from biodata_pipeline_spark.operators.caching import cache_scope
from biodata_pipeline_spark.registry import SPARK_QUERIES

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.ParquetFile(f"{src}/{t}.parquet").schema_arrow
        empty = pa.Table.from_arrays(
            [pa.array([], type=f.type) for f in schema], schema=schema
        )
        pq.write_table(empty, str(dst / f"{t}.parquet"))
    return str(dst)


def test_every_declared_query_survives_empty_tables(spark, empty_sf):
    crashed = {}
    for name, fn in SPARK_QUERIES.items():
        try:
            with cache_scope():
                n = fn(spark, empty_sf).count()
            assert n >= 0
        except Exception as e:  # noqa: BLE001 — collecting the full set
            crashed[name] = str(e).splitlines()[0][:120] if str(e) else type(e).__name__
    assert not crashed, f"{len(crashed)} queries crash on empty tables: {crashed}"


def test_empty_fallback_schemas_match_production(spark, empty_sf):
    """The empty-slice result of the eager-fit queries must carry the
    same schema the populated query produces (downstream unions and
    writers depend on it)."""
    for name in ("q_kmeans_clusters", "q_pca_projection", "q_semantic_dedup"):
        empty_schema = SPARK_QUERIES[name](spark, empty_sf).schema
        full_schema = SPARK_QUERIES[name](spark, "/root/testdata/sf0.001").schema
        assert empty_schema == full_schema, name
