"""End-to-end reproduction of the reference's stage-A narrative pipeline
(generate_narratives_from_data.py): text-lines scan → blank filter →
prompt projection → manifest anti-join (skip-if-exists) → mock LLM call →
'###' validity gate → suffix strip → idempotent sink. Run twice ⇒ the
second run plans zero work."""

from __future__ import annotations

from pyspark.sql import functions as F

from biodata_pipeline_spark.functions.textfn import (
    has_suffix_marker,
    narrative_prompt,
    strip_suffix_marker,
)
from biodata_pipeline_spark.operators.enrichment import enrich_with_external_calls
from biodata_pipeline_spark.sources.manifest import Manifest
from biodata_pipeline_spark.sources.text import read_text_lines

GENOME_LINES = [
    '{"genome_id": "83332.12", "genome_name": "M. tuberculosis H37Rv", "domain": "pathway"}',
    "",
    "  ",
    "x",  # <= 2 chars after strip → dropped like the reference
    '{"genome_id": "511145.12", "genome_name": "E. coli K-12", "domain": "subsystem"}',
    '{"genome_id": "208964.12", "genome_name": "P. aeruginosa PAO1", "domain": "ppi"}',
]


def run_pipeline(spark, input_path: str, manifest: Manifest, sink_dir: str, call):
    lines = read_text_lines(spark, input_path, col="record")
    work = lines.withColumn("key", F.md5("record")).withColumn(
        "prompt", narrative_prompt(F.col("record"))
    )
    todo = manifest.pending(work)
    if todo.isEmpty():
        return 0
    enriched = enrich_with_external_calls(todo, "prompt", call=call)
    valid = enriched.filter(has_suffix_marker("response")).withColumn(
        "narrative", strip_suffix_marker("response")
    )
    valid.select("key", "record", "narrative").write.mode("append").parquet(sink_dir)
    manifest.mark_done(valid)
    return valid.count()


def test_narrative_pipeline_end_to_end(spark, tmp_path):
    src = tmp_path / "genomes.jsonl"
    src.write_text("\n".join(GENOME_LINES))
    manifest = Manifest(str(tmp_path / "manifest"), ("key",))
    sink = str(tmp_path / "narratives")

    def fake_llm(prompt: str) -> str:
        # invalid response (no ### marker) for the ppi record → dropped by
        # the validity gate, like generate_narratives_from_data.py:69-74
        if "ppi" in prompt:
            return "truncated response without marker"
        return f"A narrative about the record. ###"

    n = run_pipeline(spark, str(src), manifest, sink, fake_llm)
    assert n == 2  # 3 valid lines, 1 fails the gate

    out = spark.read.parquet(sink)
    assert out.count() == 2
    assert all(not r.narrative.endswith("#") for r in out.collect())

    # run twice ⇒ zero new work, sink unchanged (skip-if-exists semantics);
    # the gated-out record was NOT marked done, so it is retried (the
    # reference would also retry it on the next sweep)
    n2 = run_pipeline(spark, str(src), manifest, sink, fake_llm)
    assert n2 == 0
    assert spark.read.parquet(sink).count() == 2


def test_gated_row_is_retried_until_valid(spark, tmp_path):
    src = tmp_path / "g.jsonl"
    src.write_text("\n".join(GENOME_LINES))
    manifest = Manifest(str(tmp_path / "m2"), ("key",))
    sink = str(tmp_path / "n2")

    flaky_state = {"fixed": False}

    def first_bad_then_good(prompt: str) -> str:
        if "ppi" in prompt and not flaky_state["fixed"]:
            return "no marker"
        return "ok ###"

    assert run_pipeline(spark, str(src), manifest, sink, first_bad_then_good) == 2
    flaky_state["fixed"] = True
    # NOTE: the closure is shipped to executors per-run, so flipping the
    # flag driver-side is visible to the next run's tasks
    assert run_pipeline(spark, str(src), manifest, sink, first_bad_then_good) == 1
    assert spark.read.parquet(sink).count() == 3
