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


# ------------------------------------------------------- dataset_checksum --


def _hashlib_row(parts):
    import hashlib

    sentinel = chr(1) + "NULL"
    s = chr(31).join(sentinel if p is None else str(p) for p in parts)
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_dataset_checksum_matches_hashlib_and_detects_change(spark):
    from fastselect_spark.corpus.profile import dataset_checksum

    rows = [
        ("c1", 0, "hello", "grep"),
        ("c1", 1, "world", None),
        ("c2", 0, "NULL", None),  # literal 'NULL' string vs real NULL
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, tool string"
    )
    out = dataset_checksum(
        df, cols=["conv_id", "turn_idx", "text", "tool"]
    ).collect()
    assert len(out) == 1 and out[0]["n_rows"] == 3
    expect = sum(_hashlib_row(r) for r in rows)
    assert out[0]["checksum"] == str(expect)

    # a one-character text edit changes the checksum
    rows2 = [rows[0], ("c1", 1, "world!", None), rows[2]]
    df2 = spark.createDataFrame(
        rows2, "conv_id string, turn_idx int, text string, tool string"
    )
    out2 = dataset_checksum(
        df2, cols=["conv_id", "turn_idx", "text", "tool"]
    ).collect()
    assert out2[0]["checksum"] != out[0]["checksum"]

    # NULL tool and the literal string 'NULL' hash differently
    rows3 = [rows[0], rows[1], ("c2", 0, "NULL", "NULL")]
    df3 = spark.createDataFrame(
        rows3, "conv_id string, turn_idx int, text string, tool string"
    )
    out3 = dataset_checksum(
        df3, cols=["conv_id", "turn_idx", "text", "tool"]
    ).collect()
    assert out3[0]["checksum"] != out[0]["checksum"]


def test_dataset_checksum_order_and_partitioning_invariant(spark):
    from fastselect_spark.corpus.profile import dataset_checksum

    rows = [(f"c{i}", i % 7, f"text {i}", None if i % 3 else "t") for i in range(200)]
    schema = "conv_id string, turn_idx int, text string, tool string"
    a = spark.createDataFrame(rows, schema)
    b = spark.createDataFrame(list(reversed(rows)), schema).repartition(13)
    ca = dataset_checksum(a, group_cols=["tool"]).collect()
    cb = dataset_checksum(b, group_cols=["tool"]).collect()
    assert sorted(
        [(r["tool"], r["n_rows"], r["checksum"]) for r in ca],
        key=lambda t: (t[0] is not None, t[0]),
    ) == sorted(
        [(r["tool"], r["n_rows"], r["checksum"]) for r in cb],
        key=lambda t: (t[0] is not None, t[0]),
    )
