"""Chunker invariants (SURVEY §5.5): coverage, overlap, reconstruction."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from biodata_pipeline_spark.operators.chunking import chunk_documents

CHUNK, OVERLAP, STRIDE = 256, 100, 156


def chunk_rows(spark, texts: list[str], chunk_size=CHUNK, overlap=OVERLAP):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    out = chunk_documents(df, chunk_size=chunk_size, overlap=overlap)
    return sorted(
        out.collect(), key=lambda r: (r.doc_id, r.chunk_id)
    )


def python_chunks(text: str, chunk_size=CHUNK, overlap=OVERLAP):
    """Independent reimplementation of the reference splitter geometry
    (RAG-eval-test_model.py:239-240)."""
    stride = chunk_size - overlap
    if not text:
        return []
    starts = range(0, len(text), stride)
    return [(i, s, text[s : s + chunk_size]) for i, s in enumerate(starts) if s < len(text)]


def test_empty_doc_produces_no_chunks(spark):
    assert chunk_rows(spark, [""]) == []


def test_short_doc_single_chunk(spark):
    rows = chunk_rows(spark, ["hello world"])
    assert len(rows) == 1
    assert rows[0].chunk_text == "hello world"
    assert rows[0].chunk_start == 0


def test_exact_chunk_size_doc(spark):
    text = "x" * CHUNK
    rows = chunk_rows(spark, [text])
    # chars [156, 256) are unseen by a second window start? no: start 156 < 256
    assert [r.chunk_start for r in rows] == [0, 156]
    assert rows[1].chunk_text == "x" * 100


def test_overlap_geometry(spark):
    text = "".join(chr(97 + i % 26) for i in range(600))
    rows = chunk_rows(spark, [text])
    expected = python_chunks(text)
    assert [(r.chunk_id, r.chunk_start, r.chunk_text) for r in rows] == expected
    # consecutive chunks overlap by exactly OVERLAP chars (full-size chunks)
    for a, b in zip(rows, rows[1:]):
        if len(a.chunk_text) == CHUNK:
            assert a.chunk_text[STRIDE:] == b.chunk_text[: OVERLAP]


@settings(max_examples=20, deadline=None)
@given(st.text(min_size=0, max_size=1000))
def test_property_coverage_and_reconstruction(spark, text):
    rows = chunk_rows(spark, [text])
    expected = python_chunks(text)
    got = [(r.chunk_id, r.chunk_start, r.chunk_text) for r in rows]
    assert got == expected
    # every character covered: concatenating stride-prefixes reconstructs
    recon = "".join(t[:STRIDE] for _, _, t in expected[:-1]) + (
        expected[-1][2] if expected else ""
    )
    assert recon == text


def test_overlap_must_be_smaller_than_chunk(spark):
    import pytest

    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=100, overlap=100)
