"""Source-layer format resolution (sources/tables.py): the entry path must
accept parquet, csv, and json transcripts without code changes."""

from __future__ import annotations

import pandas as pd
import pytest

from fastselect_spark.data.transcripts import (
    TRANSCRIPT_SCHEMA,
    generate_transcripts_pandas,
)
from fastselect_spark.sources import read_transcripts_table


@pytest.fixture(scope="module")
def tpdf():
    return generate_transcripts_pandas(n_convs=5, seed=7)


def _df(spark, tpdf):
    return spark.createDataFrame(tpdf, schema=TRANSCRIPT_SCHEMA)


def _check(spark, got, tpdf):
    gp = got.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    ep = tpdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(gp) == len(ep)
    assert (gp["conv_id"].astype(str) == ep["conv_id"].astype(str)).all()
    assert (gp["turn_idx"].astype(int) == ep["turn_idx"].astype(int)).all()
    # per-turn text equality under stable ordering — the row invariant
    assert (gp["text"].fillna("") == ep["text"].fillna("")).all()


def test_read_parquet_path(spark, tpdf, tmp_path):
    p = str(tmp_path / "t.parquet")
    _df(spark, tpdf).write.parquet(p)
    _check(spark, read_transcripts_table(spark, p), tpdf)


def test_read_csv_path_with_schema(spark, tpdf, tmp_path):
    p = str(tmp_path / "t.csv")
    _df(spark, tpdf).write.option("header", "true").csv(p)
    got = read_transcripts_table(spark, p, schema=TRANSCRIPT_SCHEMA)
    _check(spark, got, tpdf)


def test_read_json_path(spark, tpdf, tmp_path):
    p = str(tmp_path / "t.jsonl")
    _df(spark, tpdf).write.json(p)
    got = read_transcripts_table(spark, p, schema=TRANSCRIPT_SCHEMA)
    _check(spark, got, tpdf)


def test_catalog_identifier_routes_to_table(spark, tpdf):
    _df(spark, tpdf).createOrReplaceTempView("transcripts_view")
    got = read_transcripts_table(spark, "transcripts_view")
    assert got.count() == len(tpdf)
