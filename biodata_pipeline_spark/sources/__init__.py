from biodata_pipeline_spark.sources.tables import TABLES, load_table, load_tables
from biodata_pipeline_spark.sources.text import (
    read_jsonl,
    read_tsv_pairs,
    read_text_lines,
)
from biodata_pipeline_spark.sources.manifest import Manifest

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_text_lines",
    "read_tsv_pairs",
    "read_jsonl",
    "Manifest",
]
