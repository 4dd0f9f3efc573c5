"""Text / JSON-lines / TSV ingest.

Re-expresses the reference's line-at-a-time readers as declarative scans
(reference: data_generation/generate_narratives_from_data.py:79-85 reads a
file line-by-line keeping ``len(line.strip()) > 2``;
rag_evaluation/RAG-eval-test_model.py:123-128 reads a TSV skipping
``#``-prefixed comment lines). Filters are Column expressions so Catalyst
can push them into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_text_lines(
    spark: SparkSession, path: str, min_chars: int = 2, col: str = "value"
) -> DataFrame:
    """One row per line, dropping blank/short lines (len(strip) <= min_chars)."""
    df = spark.read.text(path)
    if col != "value":
        df = df.withColumnRenamed("value", col)
    return df.filter(F.length(F.trim(F.col(col))) > min_chars)


def read_tsv_pairs(
    spark: SparkSession,
    path: str,
    names: tuple[str, str] = ("query", "answer_key"),
    comment: str = "#",
) -> DataFrame:
    """Two-column TSV with comment lines skipped (query, answer_key)."""
    schema = T.StructType(
        [
            T.StructField(names[0], T.StringType()),
            T.StructField(names[1], T.StringType()),
        ]
    )
    return spark.read.csv(path, sep="\t", comment=comment, schema=schema)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines scan. With an explicit schema, malformed rows land in
    ``corrupt_col`` (PERMISSIVE mode) instead of being silently dropped —
    the reference drops errored rows in a bare try/except
    (generate_narratives_from_data.py:75-77); we keep them addressable so a
    re-drive manifest can be built from failures.
    """
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", corrupt_col
    )
    if schema is not None:
        if corrupt_col not in schema.fieldNames():
            schema = schema.add(corrupt_col, T.StringType())
        reader = reader.schema(schema)
    return reader.json(path)


def with_provenance(df: DataFrame, col: str = "source_file") -> DataFrame:
    """Attach each row's originating file path (the reference keys outputs
    by filename — here provenance is a real column instead)."""
    return df.withColumn(col, F.input_file_name())


def extract_path_meta(
    df: DataFrame,
    pattern: str,
    names: tuple[str, ...],
    path_col: str = "source_file",
) -> DataFrame:
    """Path-encoded metadata → real columns (SURVEY §2.2: the reference
    parses epoch/type back out of directory names,
    rag_evaluation/test_all_models.py:37-41). One regexp_extract per
    capture group over the provenance column; prefer real partition
    columns (`sinks.write_partitioned`) for new data — this is the ingest
    path for layouts the reference already wrote."""
    out = df
    for i, name in enumerate(names, start=1):
        out = out.withColumn(name, F.regexp_extract(F.col(path_col), pattern, i))
    return out
