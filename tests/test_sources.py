"""Ingest surfaces: TSV-with-comments, permissive JSON-lines with corrupt-
record routing (never silently drop), and path-metadata provenance."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from biodata_pipeline_spark.sources.text import (
    extract_path_meta,
    read_jsonl,
    read_tsv_pairs,
    with_provenance,
)


def test_read_tsv_pairs_skips_comments(spark, tmp_path):
    p = tmp_path / "terms.tsv"
    p.write_text("# header comment\nquery1\tanswer1\n# mid comment\nquery2\tanswer2\n")
    rows = read_tsv_pairs(spark, str(p)).collect()
    assert [(r.query, r.answer_key) for r in rows] == [
        ("query1", "answer1"),
        ("query2", "answer2"),
    ]


def test_read_jsonl_routes_corrupt_records(spark, tmp_path):
    p = tmp_path / "genomes.jsonl"
    p.write_text(
        '{"genome_id": "g1", "domain": "ppi"}\n'
        "THIS IS NOT JSON\n"
        '{"genome_id": "g2", "domain": "pathway"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("genome_id", T.StringType()),
            T.StructField("domain", T.StringType()),
        ]
    )
    df = read_jsonl(spark, str(p), schema=schema).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert {r.genome_id for r in good.collect()} == {"g1", "g2"}
    # the reference drops errored rows silently (bare try/except) — the
    # engine keeps them addressable for a re-drive manifest
    assert bad.count() == 1
    assert "NOT JSON" in bad.collect()[0]._corrupt_record


def test_provenance_and_path_meta(spark, tmp_path):
    base = tmp_path / "TMP_RESULTS_llama_0.4"
    base.mkdir()
    (base / "part.jsonl").write_text('{"metric": 1.5}\n')
    df = with_provenance(read_jsonl(spark, str(base)))
    out = extract_path_meta(
        df, r"TMP_RESULTS_([a-z]+)_([0-9.]+)", ("model", "epoch")
    ).collect()
    assert len(out) == 1
    assert out[0].model == "llama" and out[0].epoch == "0.4"
    assert out[0].source_file.endswith("part.jsonl")
