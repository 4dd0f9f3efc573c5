"""Bounded-concurrency external-call wrapper: deterministic mock, validity
gate, failures-as-rows, retry."""

from __future__ import annotations

from pyspark.sql import functions as F

from biodata_pipeline_spark.functions.textfn import (
    has_suffix_marker,
    strip_suffix_marker,
)
from biodata_pipeline_spark.operators.enrichment import (
    enrich_with_external_calls,
    mock_llm,
)


def test_mock_llm_is_deterministic_and_gated(spark):
    df = spark.createDataFrame([(i, f"prompt {i}") for i in range(20)], ["id", "prompt"])
    out = enrich_with_external_calls(df, "prompt").cache()
    rows = out.collect()
    assert all(r.response_error is None for r in rows)
    assert all(r.response == mock_llm(r.prompt) for r in rows)
    # every mock response passes the reference's '###' validity gate
    gated = out.filter(has_suffix_marker("response")).count()
    assert gated == 20
    stripped = out.select(strip_suffix_marker("response").alias("s")).collect()
    assert all(not r.s.endswith("###") for r in stripped)


def test_failures_become_rows_not_drops(spark):
    calls = {"n": 0}

    def flaky(prompt: str) -> str:
        if "bad" in prompt:
            raise RuntimeError("boom")
        return prompt + " ###"

    df = spark.createDataFrame(
        [(0, "ok one"), (1, "bad one"), (2, "ok two")], ["id", "prompt"]
    )
    rows = {r.id: r for r in enrich_with_external_calls(df, "prompt", call=flaky).collect()}
    assert rows[0].response == "ok one ###" and rows[0].response_error is None
    assert rows[1].response is None and "boom" in rows[1].response_error
    assert rows[2].response == "ok two ###"
    # the failed row is addressable for a re-drive manifest — count survives
    assert len(rows) == 3


def test_null_prompt_handled(spark):
    df = spark.createDataFrame([(0, None), (1, "x")], "id long, prompt string")
    rows = {r.id: r for r in enrich_with_external_calls(df, "prompt").collect()}
    assert rows[0].response is None and rows[0].response_error == "null prompt"
    assert rows[1].response_error is None
