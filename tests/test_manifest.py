"""Manifest anti-join incrementality: run-twice ⇒ zero new work
(the reference's skip-if-exists, generate_narratives_from_data.py:63-65)."""

from __future__ import annotations

from biodata_pipeline_spark.sources.manifest import Manifest, run_incremental


def test_pending_on_empty_manifest(spark, tmp_path):
    m = Manifest(str(tmp_path / "m"), ("key",))
    work = spark.createDataFrame([("a",), ("b",), ("c",)], ["key"])
    assert m.pending(work).count() == 3


def test_run_twice_zero_new_work(spark, tmp_path):
    m = Manifest(str(tmp_path / "m"), ("key",))
    sink_dir = str(tmp_path / "out")
    work = spark.createDataFrame([("a", 1), ("b", 2)], ["key", "v"])

    def transform(df):
        return df

    def sink(df):
        df.write.mode("append").parquet(sink_dir)

    assert run_incremental(work, m, transform, sink) == 2
    assert run_incremental(work, m, transform, sink) == 0
    # output written exactly once per unit
    assert spark.read.parquet(sink_dir).count() == 2


def test_corrupt_manifest_raises_instead_of_rerunning_everything(spark, tmp_path):
    """An unreadable (but existing) manifest must raise: returning an empty
    set would re-run all work and feed duplicate rows to append sinks."""
    import pytest

    m = Manifest(str(tmp_path / "m"), ("key",))
    work = spark.createDataFrame([("a",), ("b",)], ["key"])
    m.mark_done(work)
    for f in (tmp_path / "m").glob("*.parquet"):
        f.write_bytes(b"garbage")
    with pytest.raises(Exception):
        m.pending(work).count()


def test_incremental_picks_up_new_units(spark, tmp_path):
    m = Manifest(str(tmp_path / "m"), ("key",))
    sink_dir = str(tmp_path / "out")
    w1 = spark.createDataFrame([("a", 1)], ["key", "v"])
    w2 = spark.createDataFrame([("a", 1), ("b", 2)], ["key", "v"])
    sink = lambda df: df.write.mode("append").parquet(sink_dir)  # noqa: E731
    assert run_incremental(w1, m, lambda d: d, sink) == 1
    assert run_incremental(w2, m, lambda d: d, sink) == 1  # only 'b' is new
