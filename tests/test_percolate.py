"""Percolate (reverse search): membership must equal the forward
engine's match set for the SAME query over the same corpus — the
oracle's full scored set is the reference — plus role filters, the
required-term prefilter, and the streaming-alert wiring."""

from __future__ import annotations

import pytest

from xf_spark.oracle import OracleIndex
from xf_spark.query.percolate import (
    matches_doc,
    percolate,
    required_terms,
)
from xf_spark.transcripts import load_transcripts

SCALE = 0.001

QUERIES = [
    "machine",
    "rust async",
    "rust AND async",
    "python NOT snake",
    '"machine learning"',
    '"machine learning"~2',
    '"learning machine"~~2',
    "progr*",
    "ma?hine",
    "machne~2",
    '"machine lear*"',
    "machine rust learning",
]


@pytest.fixture(scope="module")
def corpus(spark):
    tr = load_transcripts(spark, SCALE)
    docs = tr.selectExpr(
        "conv_id", "turn_idx", "role", "text"
    ).withColumn("doc_id", (tr.turn_idx + 0).cast("long"))
    # stable doc ids: use the engine's assignment via the oracle build
    rows = tr.orderBy("conv_id", "turn_idx").collect()
    rows = [(i, r["text"], r["role"]) for i, r in enumerate(rows)]
    oracle = OracleIndex.build([(i, t) for i, t, _ in rows])
    return rows, oracle


def test_membership_equals_forward_search(spark, corpus):
    rows, oracle = corpus
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [i for i, _, _ in rows], "text": [t for _, t, _ in rows]}
        )
    )
    got = (
        percolate(docs, [(q, q) for q in QUERIES])
        .groupBy("qid")
        .agg({"doc_id": "collect_set"})
        .collect()
    )
    got_map = {r["qid"]: set(r["collect_set(doc_id)"]) for r in got}
    for q in QUERIES:
        want = {d for d, _ in oracle.search(q, limit=10**9)}
        assert got_map.get(q, set()) == want, q


def test_matches_doc_scalar(corpus):
    rows, oracle = corpus
    # spot-check the single-doc facade on 50 docs x all queries
    for q in QUERIES:
        want = {d for d, _ in oracle.search(q, limit=10**9)}
        for i, text, _role in rows[:50]:
            assert matches_doc(q, text) == (i in want), (q, i)


def test_role_filter(spark, corpus):
    rows, _ = corpus
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [i for i, _, _ in rows],
                "text": [t for _, t, _ in rows],
                "role": [r for _, _, r in rows],
            }
        )
    )
    out = percolate(
        docs,
        [("a", "type:assistant machine"), ("u", "type:user machine")],
        role_col="role",
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], set()).add(r["doc_id"])
    roles = {i: ro for i, _, ro in rows}
    assert by_q["a"] and all(roles[d] == "assistant" for d in by_q["a"])
    assert by_q["u"] and all(roles[d] == "user" for d in by_q["u"])
    assert by_q["a"].isdisjoint(by_q["u"])
    with pytest.raises(ValueError, match="role_col"):
        percolate(docs, [("x", "type:assistant rust")])
    with pytest.raises(ValueError, match="percolate query"):
        percolate(docs, [("bad", "NOT type:assistant rust")], role_col="role")


def test_required_terms_prefilter():
    from xf_spark.query.parser import parse_query

    assert required_terms(parse_query("rust AND async")) == {"rust", "async"}
    assert required_terms(parse_query('"machine learning"')) == {
        "machine",
        "learning",
    }
    assert required_terms(parse_query("rust OR async")) == set()
    assert required_terms(parse_query("rust NOT async")) == {"rust"}
    assert required_terms(parse_query("te*m")) == set()
    # OR with a shared member keeps the intersection
    assert required_terms(parse_query('"rust async" OR rust')) == {"rust"}
    # prefilter soundness on a real doc: required absent => no match
    assert not matches_doc("rust AND async", "only rust here")


def test_percolate_streaming_alerts(spark, tmp_path, corpus):
    """The alerting wire: percolate inside foreachBatch over a file
    stream (availableNow) — every matching (doc_id, qid) lands in the
    sink exactly once."""
    rows, oracle = corpus
    import pandas as pd

    src = tmp_path / "in"
    src.mkdir()
    pd.DataFrame(
        {"doc_id": [i for i, _, _ in rows[:300]],
         "text": [t for _, t, _ in rows[:300]]}
    ).to_parquet(src / "batch0.parquet", coerce_timestamps="us")
    sink = str(tmp_path / "alerts")
    queries = [("ml", '"machine learning"'), ("wild", "ma?hine")]

    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )

    def alert(batch_df, _bid):
        percolate(batch_df, queries).write.mode("append").parquet(sink)

    q = stream.writeStream.foreachBatch(alert).trigger(
        availableNow=True
    ).option("checkpointLocation", str(tmp_path / "ck")).start()
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["qid"]) for r in spark.read.parquet(sink).collect()
    }
    want = set()
    for qid, qq in queries:
        for d, _ in oracle.search(qq, limit=10**9):
            if d < 300:
                want.add((d, qid))
    assert got == want


def test_percolate_cli(spark, tmp_path, corpus):
    """CLI wiring: percolate --queries file --input parquet --out dir
    writes (doc_id, qid) pairs equal to the library call; bad query
    files get a friendly one-liner."""
    import json
    import os
    import subprocess
    import sys

    import pandas as pd

    rows, oracle = corpus
    src = tmp_path / "docs.parquet"
    pd.DataFrame(
        {"doc_id": [i for i, _, _ in rows[:400]],
         "text": [t for _, t, _ in rows[:400]],
         "role": [r for _, _, r in rows[:400]]}
    ).to_parquet(src, coerce_timestamps="us")
    qfile = tmp_path / "alerts.json"
    qfile.write_text(json.dumps({"ml": '"machine learning"', "w": "ma?hine"}))
    env = dict(os.environ, PYTHONPATH="/root/repo")
    out_dir = str(tmp_path / "alerts_out")
    r = subprocess.run(
        [sys.executable, "-m", "xf_spark", "--cores", "4", "percolate",
         "--queries", str(qfile), "--input", str(src), "--out", out_dir],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ml:" in r.stdout and "w:" in r.stdout
    got = {
        (x["doc_id"], x["qid"]) for x in spark.read.parquet(out_dir).collect()
    }
    want = set()
    for qid, q in [("ml", '"machine learning"'), ("w", "ma?hine")]:
        for d, _ in oracle.search(q, limit=10**9):
            if d < 400:
                want.add((d, qid))
    assert got == want
    r = subprocess.run(
        [sys.executable, "-m", "xf_spark", "--cores", "4", "percolate",
         "--queries", str(tmp_path / "nope.json"), "--input", str(src)],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300,
    )
    assert r.returncode == 1 and "bad --queries" in r.stdout
