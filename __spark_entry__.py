"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship retrieval-rank pipeline at sf0.001;
``queries()`` exposes every declared operator from SURVEY.md §2 (plus the
training-data-pipeline extensions); ``oracle_sql()`` gives the DuckDB
equivalent for each deterministic query (approximate/stateful operators
are rows-only by design — SURVEY §5.1 non-determinism quarantine).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from biodata_pipeline_spark.registry import ORACLE_SQL, SPARK_QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    documents → overlapping chunks → deterministic embedding attach →
    rank all chunks per query by cosine → word-boundary match →
    per-query rank metrics with no-match sentinel
    (reference: rag_evaluation/RAG-eval-test_model.py:119-153).
    """
    return SPARK_QUERIES["q26_retrieval_rank_detail"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every deterministic declared query."""
    return dict(ORACLE_SQL)
