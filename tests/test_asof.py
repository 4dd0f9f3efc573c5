"""As-of join vs pandas merge_asof (the reference semantics oracle)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from biodata_pipeline_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 15, 150.0), (3, 5, 50.0)],
        ["k", "ts", "lv"],
    )
    right = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 18, "c"), (2, 20, "d")],
        ["k", "ts", "rv"],
    )
    return left, right


def test_asof_backward_inclusive(spark, frames):
    left, right = frames
    out = {
        (r.k, r.ts): (r.ts_right, r.rv)
        for r in asof_join(left, right, on="k", right_payload=("rv",)).collect()
    }
    assert out[(1, 10)] == (10, "b")   # exact match allowed
    assert out[(1, 20)] == (18, "c")
    assert out[(2, 15)] == (None, None)  # right row is later
    assert out[(3, 5)] == (None, None)   # no right rows for key


def test_asof_backward_strict(spark, frames):
    left, right = frames
    out = {
        (r.k, r.ts): (r.ts_right, r.rv)
        for r in asof_join(
            left, right, on="k", right_payload=("rv",), allow_exact_matches=False
        ).collect()
    }
    assert out[(1, 10)] == (5, "a")  # exact match excluded → earlier row


def test_asof_matches_pandas(spark):
    import random

    rng = random.Random(3)
    left_rows = [(rng.randint(1, 5), rng.randint(0, 1000)) for _ in range(200)]
    right_rows = [
        (rng.randint(1, 5), rng.randint(0, 1000), i) for i in range(150)
    ]
    # dedupe (k, ts) on the right deterministically: keep max payload
    best = {}
    for k, ts, v in right_rows:
        best[(k, ts)] = max(best.get((k, ts), -1), v)
    right_rows = [(k, ts, v) for (k, ts), v in best.items()]

    left = spark.createDataFrame(left_rows, ["k", "ts"])
    right = spark.createDataFrame(right_rows, ["k", "ts", "v"])
    got = {
        (r.k, r.ts): r.v
        for r in asof_join(left, right, on="k", right_payload=("v",)).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["k", "ts"]).sort_values("ts", kind="stable")
    rp = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values("ts", kind="stable")
    merged = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    for _, row in merged.iterrows():
        expect = None if pd.isna(row.v) else int(row.v)
        assert got[(row.k, row.ts)] == expect


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_asof_matches_pandas_merge_asof(spark, data):
    """Property: asof_join == pandas.merge_asof on random keyed frames
    (both exact-match modes)."""
    import pandas as pd

    n_left = data.draw(st.integers(1, 25))
    n_right = data.draw(st.integers(0, 25))
    keys = data.draw(st.sampled_from([1, 2, 3]))
    allow_exact = data.draw(st.booleans())
    lrows = [
        (i, data.draw(st.integers(0, keys - 1)), data.draw(st.integers(0, 50)))
        for i in range(n_left)
    ]
    rrows = sorted(
        {
            (data.draw(st.integers(0, keys - 1)), data.draw(st.integers(0, 50)))
            for _ in range(n_right)
        }
    )
    rrows = [(k, t, 100 + i) for i, (k, t) in enumerate(rrows)]  # unique payload
    left = spark.createDataFrame(lrows, "lid long, k long, ts long")
    right = spark.createDataFrame(rrows, "k long, ts long, payload long")

    got = {
        r.lid: r.payload
        for r in asof_join(
            left, right, on="k", right_payload=("payload",),
            allow_exact_matches=allow_exact,
        ).collect()
    }

    lp = pd.DataFrame(lrows, columns=["lid", "k", "ts"]).sort_values("ts", kind="stable")
    rp = pd.DataFrame(rrows, columns=["k", "ts", "payload"]).sort_values("ts", kind="stable")
    if len(rp):
        merged = pd.merge_asof(
            lp, rp, on="ts", by="k", allow_exact_matches=allow_exact
        )
        expect = {
            int(r.lid): (None if pd.isna(r.payload) else int(r.payload))
            for r in merged.itertuples()
        }
    else:
        expect = {int(r.lid): None for r in lp.itertuples()}
    assert got == expect


def test_asof_join_null_keys_never_match(spark):
    """JOIN semantics: NULL keys equal nothing. The union-and-carry
    window would otherwise group null-key rows into one partition and
    'match' them to each other (null probe, round 6)."""
    from pyspark.sql import functions as F

    from biodata_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, None, 100), (2, 7, 100)], "id long, user_id long, ts long"
    )
    right = spark.createDataFrame(
        [(None, 50, 900), (7, 50, 901)],
        "user_id long, ts long, click_id long",
    )
    out = {
        r.id: r.click_id
        for r in asof_join(
            left, right, on="user_id", right_payload=("click_id",)
        ).collect()
    }
    assert out[1] is None  # null-key purchase matches nothing
    assert out[2] == 901  # real key still matches
