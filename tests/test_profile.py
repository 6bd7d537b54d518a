"""table_profile tests: planted nulls/ties/all-null column, the
string-canonical ordering contract, and a pandas replica."""

from __future__ import annotations

import pandas as pd
import pytest

from fastselect_spark.corpus.profile import table_profile


@pytest.fixture(scope="module")
def profile_rows(spark):
    pdf = pd.DataFrame(
        {
            "k": ["a", "b", "b", "c", None, "b"],
            "n": [10, 9, 10, None, 2, 10],
            "dead": [None] * 6,
        }
    ).astype({"n": "Int64"})
    df = spark.createDataFrame(pdf)
    out = table_profile(df).collect()
    return {r["column"]: r.asDict() for r in out}


def test_counts_and_mode(profile_rows):
    k = profile_rows["k"]
    assert k["n_rows"] == 6 and k["n_null"] == 1 and k["n_distinct"] == 3
    assert k["top_value"] == "b" and k["top_count"] == 3
    assert k["min_value"] == "a" and k["max_value"] == "c"


def test_string_canonical_ordering(profile_rows):
    """min/max/top are over the STRING form — '10' < '9' lexicographically
    (the documented canonicalization contract)."""
    n = profile_rows["n"]
    assert n["min_value"] == "10" and n["max_value"] == "9"
    assert n["top_value"] == "10" and n["top_count"] == 3
    assert n["n_null"] == 1 and n["n_distinct"] == 3


def test_all_null_column(profile_rows):
    d = profile_rows["dead"]
    assert d["n_null"] == 6 and d["n_distinct"] == 0
    assert d["min_value"] is None and d["max_value"] is None
    assert d["top_value"] is None and d["top_count"] is None


def test_tie_breaks_to_smallest_value(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"x": ["z", "z", "a", "a"]})
    )
    row = table_profile(df, ["x"]).collect()[0]
    assert row["top_value"] == "a" and row["top_count"] == 2
