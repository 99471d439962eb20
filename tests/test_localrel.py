"""arrow_local / empty_local: the serving-tier local-relation helpers.

Every k-bounded result page flows through these (segment_search,
engine, hybrid, results), so their dtype/None/fallback behavior is
load-bearing for every query surface."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import types as T

from xf_spark.query.segment_search import TOPK_SCHEMA, arrow_local, empty_local


def test_dict_numpy_roundtrip(spark):
    ids = np.array([7, 3, 11], dtype=np.int64)
    sc = np.array([2.5, 1.5, 0.5], dtype=np.float64)
    df = arrow_local(spark, TOPK_SCHEMA, {"doc_id": ids, "score": sc})
    assert df.schema == TOPK_SCHEMA
    rows = df.collect()
    assert [(r.doc_id, r.score) for r in rows] == [(7, 2.5), (3, 1.5), (11, 0.5)]


def test_schema_string_and_column_order(spark):
    # data dict in the WRONG order: emission must follow schema order
    df = arrow_local(
        spark, "a long, b string", {"b": ["x", "y"], "a": [1, 2]}
    )
    assert df.columns == ["a", "b"]
    assert [tuple(r) for r in df.collect()] == [(1, "x"), (2, "y")]


def test_plain_lists_with_nones(spark):
    df = arrow_local(
        spark, "conv_id string, turn_idx int",
        {"conv_id": ["c1", None, "c3"], "turn_idx": [1, 2, None]},
    )
    rows = df.collect()
    assert rows[1].conv_id is None and rows[2].turn_idx is None
    # int32 cast applied per schema
    assert dict(df.dtypes)["turn_idx"] == "int"


def test_pandas_input(spark):
    pdf = pd.DataFrame({"doc_id": [1, 2], "score": [0.25, 0.125]})
    df = arrow_local(spark, TOPK_SCHEMA, pdf)
    assert [tuple(r) for r in df.collect()] == [(1, 0.25), (2, 0.125)]


def test_empty_inputs_route_to_limit0(spark):
    for data in ({"doc_id": np.empty(0, np.int64), "score": np.empty(0)},
                 pd.DataFrame({"doc_id": [], "score": []})):
        df = arrow_local(spark, TOPK_SCHEMA, data)
        assert df.collect() == []
        assert df.schema == TOPK_SCHEMA


def test_empty_local_typed_schema(spark):
    df = empty_local(spark, "a string, b int, c timestamp, d double")
    assert df.collect() == []
    assert [f.dataType for f in df.schema.fields] == [
        T.StringType(), T.IntegerType(), T.TimestampType(), T.DoubleType(),
    ]


def test_fallback_on_exotic_input(spark):
    # dict-of-objects pa.array can't infer -> pandas fallback still lands
    df = arrow_local(
        spark, "a string, ts timestamp",
        {
            "a": ["x"],
            "ts": [dt.datetime(2024, 1, 2, 3, 4, 5)],
        },
    )
    r = df.collect()[0]
    assert r.a == "x" and r.ts == dt.datetime(2024, 1, 2, 3, 4, 5)


def test_all_none_column_casts(spark):
    df = arrow_local(spark, "a string, n long", {"a": [None, None], "n": [1, 2]})
    rows = df.collect()
    assert [r.a for r in rows] == [None, None]
    assert [r.n for r in rows] == [1, 2]
