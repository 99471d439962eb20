"""Driver-contract conformance: run every queries() entry at sf0.01 and
compare against its oracle_sql() via DuckDB — the same row-set /
column-name / value comparison the driver performs."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_query_has_oracle():
    # round 2: every driver entry must carry a DuckDB differential
    missing = set(QUERIES) - set(ORACLES)
    assert not missing, f"queries without oracle SQL: {missing}"


@pytest.mark.parametrize(
    "name",
    sorted(set(QUERIES) - set(ORACLES)),
    ids=sorted(set(QUERIES) - set(ORACLES)),
)
def test_rows_only_queries_nonempty(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() > 0
    assert df.columns


@pytest.mark.parametrize("name", sorted(ORACLES), ids=sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    got, want = _rowset(srows, scols), _rowset(orows, ocols)
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert got == want, f"{name}: value mismatch\n first got={got[:3]}\n first want={want[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"doc_id", "score", "text"} <= set(df.columns)
