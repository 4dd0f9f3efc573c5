"""biodata_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline (``cucinellclark/biodata-pipeline``):
scan/filter/project/join/aggregate/window/sort, text chunking, vector
similarity and retrieval-rank metrics, sweep grids, incremental
(skip-if-exists) manifests, and streaming ingest — all declared through the
DataFrame/SQL API so Catalyst + AQE pick the physical plan.

Layout:
    sources/    table loaders, text/JSON/TSV ingest, manifests, sinks
    functions/  column-level helpers (vector math, text templates/analysis)
    operators/  composite dataflow operators (chunking, retrieval, dedup,
                as-of join, sessionization, grids, enrichment, multimodal)
    streaming/  Structured Streaming surfaces (availableNow ingest, windows)
    plans/      plan-inspection helpers (explain, shuffle counting)
"""

__version__ = "0.1.0"

from biodata_pipeline_spark.session import get_spark

__all__ = ["get_spark", "__version__"]
