"""Snapshot diffing: added/removed/changed classification and the
incremental work set (only new-or-changed rows re-enter the pipeline)."""

from __future__ import annotations

from pyspark.sql import functions as F

from biodata_pipeline_spark.operators.snapshot import (
    incremental_work_set,
    snapshot_diff,
)


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_snapshot_diff_classifies(spark):
    old = _corpus(spark, [(1, "a"), (2, "b"), (3, "c"), (4, "d")])
    new = _corpus(spark, [(2, "b"), (3, "c CHANGED"), (4, "d"), (5, "e")])
    got = {r.doc_id: r for r in snapshot_diff(old, new).collect()}
    assert set(got) == {1, 3, 5}
    assert got[1].status == "removed" and got[1].chars_new is None
    assert got[3].status == "changed" and (got[3].chars_old, got[3].chars_new) == (1, 9)
    assert got[5].status == "added" and got[5].chars_old is None


def test_snapshot_diff_empty_on_identical(spark):
    old = _corpus(spark, [(1, "a"), (2, "b")])
    assert snapshot_diff(old, old).count() == 0


def test_incremental_work_set_is_added_plus_changed(spark):
    old = _corpus(spark, [(1, "a"), (2, "b")])
    new = _corpus(spark, [(1, "a"), (2, "b2"), (3, "c")])
    got = sorted(r.doc_id for r in incremental_work_set(old, new).collect())
    assert got == [2, 3]


def test_diff_join_is_fingerprint_narrow(spark):
    """The full-outer join must carry fingerprints, not document text —
    text may only be read beneath the projections feeding the join."""
    old = _corpus(spark, [(1, "a" * 1000)])
    new = _corpus(spark, [(1, "b" * 1000)])
    plan = snapshot_diff(old, new)._jdf.queryExecution().optimizedPlan().toString()
    join_idx = plan.find("Join FullOuter")
    assert join_idx != -1
    # above the join (the text BEFORE it in the plan string) no raw text
    # column may appear — only ids, fingerprints, lengths
    assert "text#" not in plan[:join_idx]


def test_snapshot_diff_is_antisymmetric(spark):
    """diff(old, new) and diff(new, old) must mirror: added <-> removed,
    changed <-> changed (hypothesis-generated corpora)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    texts = st.dictionaries(
        st.integers(min_value=0, max_value=20),
        st.text(alphabet="abc ", max_size=8),
        max_size=10,
    )

    @given(texts, texts)
    @settings(max_examples=8, deadline=None)
    def check(old_rows, new_rows):
        old = _corpus(spark, list(old_rows.items()) or [(999, "x")])
        new = _corpus(spark, list(new_rows.items()) or [(999, "x")])
        fwd = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
        rev = {r.doc_id: r.status for r in snapshot_diff(new, old).collect()}
        flip = {"added": "removed", "removed": "added", "changed": "changed"}
        assert rev == {k: flip[v] for k, v in fwd.items()}

    check()


def test_snapshot_diff_custom_text_col(spark):
    """ADVICE r5: tables without a 'text' column work via text_col."""
    old = spark.createDataFrame([(1, "aaa"), (2, "bb")], "doc_id long, body string")
    new = spark.createDataFrame([(1, "aaa"), (2, "bbbb")], "doc_id long, body string")
    got = {r.doc_id: r for r in snapshot_diff(old, new, text_col="body").collect()}
    assert set(got) == {2}
    assert got[2].status == "changed"
    assert (got[2].chars_old, got[2].chars_new) == (2, 4)
    work = incremental_work_set(old, new, text_col="body")
    assert [r.doc_id for r in work.collect()] == [2]


def test_edit_severity_grades_changes(spark):
    """Trivial append keeps >=0.9 shingle overlap, a replaced tail lands
    moderate, a full rewrite lands rewrite; unchanged docs emit no row;
    a changed-but-shingleless doc grades trivial (nothing measurable at
    shingle granularity)."""
    from pyspark.sql import functions as F

    from biodata_pipeline_spark.operators.snapshot import edit_severity

    base = " ".join(f"tok{i}" for i in range(40))
    old = spark.createDataFrame(
        [
            (1, base),
            (2, base),
            (3, base),
            (4, base),
            (5, "a b"),  # too short for 3-shingles
        ],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (1, base + " tail"),                                  # trivial
            (2, " ".join(f"tok{i}" for i in range(30))
                + " fresh ending material here now"),             # moderate
            (3, " ".join(f"other{i}" for i in range(40))),        # rewrite
            (4, base),                                            # unchanged
            (5, "a c"),                                           # changed, shingleless
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.severity, r.jaccard)
        for r in edit_severity(old, new).collect()
    }
    assert set(got) == {1, 2, 3, 5}
    assert got[1][0] == "trivial" and got[1][1] >= 0.9
    assert got[2][0] == "moderate"
    assert got[3][0] == "rewrite" and got[3][1] == 0.0
    assert got[5] == ("trivial", 1.0)
