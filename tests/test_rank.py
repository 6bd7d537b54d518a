"""Distributed average-rank + Spearman tests: pandas rank(method=
'average') parity under heavy ties and many partitions, tie-group
carry across Arrow batch boundaries, and the Spearman replica."""

from __future__ import annotations

def test_average_ranks_driver_path_matches_distributed(spark, monkeypatch):
    """The small-input driver ranking (round-6) must equal the
    range-partitioned two-pass kernel row-for-row, ties and all."""
    import numpy as np

    import fastselect_spark.selection._agg as aggmod
    from fastselect_spark.selection.rank import average_ranks_long

    rng = np.random.default_rng(23)
    rows = [
        (f"f{j % 3}", float(rng.integers(0, 20)), str(i))
        for i, j in enumerate(rng.integers(0, 3, 500))
    ]
    melted = spark.createDataFrame(rows, "feature string, value double, id string")
    key = lambda r: (r["feature"], r["id"])  # noqa: E731
    fast = sorted(
        ((r["feature"], r["id"]), r["rank"])
        for r in average_ranks_long(melted, num_partitions=8).collect()
    )
    monkeypatch.setattr(aggmod, "plan_size_bytes", lambda _df: 1 << 62)
    slow = sorted(
        ((r["feature"], r["id"]), r["rank"])
        for r in average_ranks_long(melted, num_partitions=8).collect()
    )
    assert fast == slow


def test_ks_driver_path_matches_distributed(spark, monkeypatch):
    """ks_statistics' small-input path must equal the two-pass kernel."""
    import numpy as np

    import fastselect_spark.selection._agg as aggmod
    from fastselect_spark.featurize import ks_statistics

    rng = np.random.default_rng(29)
    d0 = spark.createDataFrame(
        [(float(v), float(v) * 2) for v in rng.integers(0, 50, 400)],
        "a double, b double",
    )
    d1 = spark.createDataFrame(
        [(float(v) + 3.0, float(v)) for v in rng.integers(0, 50, 300)],
        "a double, b double",
    )
    fast = sorted(
        (r["feature"], r["ks"])
        for r in ks_statistics(d0, d1, ["a", "b"], num_partitions=8).collect()
    )
    monkeypatch.setattr(aggmod, "plan_size_bytes", lambda _df: 1 << 62)
    slow = sorted(
        (r["feature"], r["ks"])
        for r in ks_statistics(d0, d1, ["a", "b"], num_partitions=8).collect()
    )
    assert fast == slow

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fastselect_spark.selection.correlation import spearman_matrix
from fastselect_spark.selection.rank import average_ranks_long

COLS = ["a", "b", "c"]


@pytest.fixture(scope="module")
def rank_pdf():
    rng = np.random.default_rng(3)
    n = 2000
    pdf = pd.DataFrame(
        {
            "id": [str(i) for i in range(n)],
            "a": rng.integers(0, 20, n).astype(float),  # heavy ties
            "b": rng.normal(size=n),
        }
    )
    pdf["c"] = pdf["a"] * 3 + rng.integers(0, 2, n)
    return pdf


def _melt(df, cols):
    return df.select(
        "id",
        F.stack(
            F.lit(len(cols)),
            *[x for c in cols for x in (F.lit(c), F.col(c))],
        ).alias("feature", "value"),
    )


def test_ranks_match_pandas_average(spark, rank_pdf):
    df = spark.createDataFrame(rank_pdf)
    got = average_ranks_long(
        _melt(df, ["a", "b"]), num_partitions=7
    ).toPandas()
    for feat in ("a", "b"):
        g = got[got.feature == feat].set_index("id")["rank"]
        exp = rank_pdf.set_index("id")[feat].rank(method="average")
        assert np.allclose(g.reindex(exp.index).values, exp.values)


def test_ranks_partition_invariant(spark, rank_pdf):
    """Same ranks at 2 and 13 range partitions — the per-(partition, key)
    offset bookkeeping must be layout-independent."""
    df = spark.createDataFrame(rank_pdf)
    a = (
        average_ranks_long(_melt(df, ["a"]), num_partitions=2)
        .toPandas()
        .set_index("id")["rank"]
    )
    b = (
        average_ranks_long(_melt(df, ["a"]), num_partitions=13)
        .toPandas()
        .set_index("id")["rank"]
    )
    assert (a.sort_index() == b.sort_index()).all()


def test_single_giant_tie_group(spark):
    """A constant column is one tie group spanning every batch/partition —
    every row gets rank (n+1)/2 via the cross-batch carry path."""
    n = 500
    pdf = pd.DataFrame({"id": [str(i) for i in range(n)], "k": [7.0] * n})
    df = spark.createDataFrame(pdf)
    out = average_ranks_long(_melt(df, ["k"]), num_partitions=5).toPandas()
    assert len(out) == n
    assert (out["rank"] == (n + 1) / 2.0).all()


def test_null_values_excluded(spark):
    pdf = pd.DataFrame(
        {"id": ["0", "1", "2", "3"], "x": [3.0, None, 1.0, 2.0]}
    )
    df = spark.createDataFrame(pdf)
    out = average_ranks_long(_melt(df, ["x"])).toPandas()
    assert len(out) == 3
    got = out.set_index("id")["rank"]
    assert got["2"] == 1.0 and got["3"] == 2.0 and got["0"] == 3.0


def test_spearman_matches_replica(spark, rank_pdf):
    df = spark.createDataFrame(rank_pdf)
    S = spearman_matrix(df, COLS, ["id"])
    R = np.corrcoef(
        np.vstack(
            [rank_pdf[c].rank(method="average").to_numpy() for c in COLS]
        )
    )
    assert np.allclose(S, R, atol=1e-12)
    assert S[0, 2] > 0.99  # planted monotone relation
