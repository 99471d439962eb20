"""Tests: XfIndex facade, CLI, archive source reader, and query-level
parallelism invariance (N vs 4N rank identity)."""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

import pytest

from xf_spark.engine import XfIndex
from xf_spark.oracle import OracleIndex
from xf_spark.sources.archive import (
    conversations_grouped,
    read_transcript_archive,
)
from xf_spark.transcripts import ensure_transcripts_parquet, load_transcripts

SCALE = 0.001


@pytest.fixture(scope="module")
def xfindex(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("xfidx"))
    tr = load_transcripts(spark, SCALE)
    ix = XfIndex.build(tr, path, n_shards=4, n_buckets=16, slices=2).cache()
    rows = ix.docs.select("doc_id", "text").collect()
    oracle = OracleIndex.build([(r["doc_id"], r["text"]) for r in rows])
    return ix, oracle, path


class TestXfIndex:
    def test_lexical_matches_oracle(self, xfindex):
        ix, oracle, _ = xfindex
        got = [r["doc_id"] for r in ix.search("machine", mode="lexical", limit=10).collect()]
        want = [d for d, _ in oracle.search("machine", limit=10)]
        assert got == want

    def test_modes_and_aliases(self, xfindex):
        ix, _, _ = xfindex
        for mode in ["lexical", "semantic", "hybrid", "bm25", "vector", "rrf"]:
            assert ix.search("rust", mode=mode, limit=3).count() == 3
            # msearch accepts the SAME mode vocabulary as search()
            assert len(ix.msearch(["rust"], limit=3, mode=mode)["rust"]) == 3

    def test_fast_path_matches_dataframe_route(self, xfindex):
        # search() serves unfiltered relevance queries via the msearch
        # fast path (one Arrow round-trip); the DataFrame route must
        # stay rank- and score-identical for every query shape
        ix, _, _ = xfindex
        shapes = [
            ("machine", "lexical"),
            ("machine learning", "lexical"),
            ('"machine learning"', "lexical"),
            ("rust NOT python", "lexical"),
            ("mach*", "lexical"),
            ("machine", "semantic"),
            ("machine", "hybrid"),
        ]
        for q, mode in shapes:
            fast = ix.search(q, mode=mode, limit=10).collect()
            hits = ix._search_hits(
                q, mode=mode, limit=10, roles=None, since=None,
                until=None, offset=0, fuzzy=False, ann=False,
                n_probe=None,
            )
            slow, _ = ix._hydrate(hits)
            srows = slow.collect()
            assert [(r["doc_id"], round(r["score"], 9)) for r in fast] == [
                (r["doc_id"], round(r["score"], 9)) for r in srows
            ], (q, mode)

    def test_fast_path_raises_on_parse_error(self, xfindex):
        # msearch isolates bad batch members as empty results, but the
        # single-query facade must keep the loud-raise contract
        ix, _, _ = xfindex
        with pytest.raises(ValueError):
            ix.search("NOT type:assistant machine", mode="lexical", limit=5)

    def test_context_view_shape(self, xfindex):
        # context REPLACES hydration/snippets (different output shape:
        # every turn of each matched conversation, turn order)
        ix, _, _ = xfindex
        out = ix.search("machine", mode="lexical", limit=3,
                        snippets=True, context=True)
        rows = out.collect()
        assert rows and "is_match" in out.columns
        assert "snippet" not in out.columns
        by_conv = {}
        for r in rows:
            by_conv.setdefault(r["conv_id"], []).append(r["turn_idx"])
        for idxs in by_conv.values():
            assert idxs == sorted(idxs)
        assert any(r["is_match"] for r in rows)

    def test_natural_language_dates(self, xfindex):
        ix, _, _ = xfindex
        out = ix.search("rust", mode="lexical", limit=50, since="2024", until="2024")
        rows = out.collect()
        assert all(r["ts"].year == 2024 for r in rows)

    def test_role_filter_hybrid(self, xfindex):
        ix, _, _ = xfindex
        rows = ix.search("rust", mode="hybrid", limit=10, roles=["tool"]).collect()
        assert all(r["role"] == "tool" for r in rows)

    def test_role_filter_case_insensitive(self, xfindex):
        # roles are stored lowercase; caller input is normalized at the
        # engine boundary so '--roles Tool' matches instead of silently
        # returning nothing
        ix, _, _ = xfindex
        want = [r["doc_id"] for r in
                ix.search("machine", mode="lexical", limit=10, roles=["user"]).collect()]
        got = [r["doc_id"] for r in
               ix.search("machine", mode="lexical", limit=10, roles=[" User "]).collect()]
        assert want and got == want

    def test_reopen_from_disk(self, xfindex, spark):
        ix, oracle, path = xfindex
        reopened = XfIndex.open(spark, path)
        got = [r["doc_id"] for r in reopened.search("machine", mode="lexical", limit=5).collect()]
        want = [d for d, _ in oracle.search("machine", limit=5)]
        assert got == want

    def test_stats(self, xfindex):
        ix, _, _ = xfindex
        s = ix.stats(detailed=True)
        assert s["n_turns"] == 1512
        assert sum(d["n"] for d in s["daily"]) == 1512
        # per-doc-type counts (StorageStats analog): zero on a
        # transcript corpus — archive-typed conv_id prefixes absent
        assert s["doc_types"] == {
            "tweets": 0, "likes": 0, "dm_messages": 0,
            "dm_conversations": 0, "grok_messages": 0,
        }


class TestQueryParallelismInvariance:
    """North-rule N-vs-4N proxy at the QUERY level: the same persisted
    index searched under different session parallelism must return
    rank-identical results (scores are global-stat-based)."""

    def test_rank_identity_across_shuffle_partitions(self, xfindex, spark):
        ix, _, path = xfindex
        old = spark.conf.get("spark.sql.shuffle.partitions")
        results = {}
        for parts in ("2", "16"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            reopened = XfIndex.open(spark, path)
            results[parts] = [
                (r["doc_id"], round(r["score"], 9))
                for r in reopened.search("rust async", mode="lexical", limit=30).collect()
            ]
        spark.conf.set("spark.sql.shuffle.partitions", old)
        assert results["2"] == results["16"]


class TestArchiveSource:
    def test_js_wrapped_roundtrip(self, spark, tmp_path):
        rows = [
            {"conv_id": "c1", "turn_idx": 0, "role": "user",
             "text": "hello world", "tool": "", "ts": "2024-01-05T10:00:00"},
            {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
             "text": "hi there", "tool": "", "ts": "Fri Jan 05 10:01:00 +0000 2024"},
            {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
             "text": "hi there", "tool": "", "ts": "Fri Jan 05 10:01:00 +0000 2024"},
            {"conv_id": "c0", "turn_idx": 0, "role": "user",
             "text": "earlier conv", "tool": "", "ts": "2023-06-01T08:00:00"},
        ]
        f = tmp_path / "transcripts-part0.js"
        f.write_text(
            "window.YTD.transcripts.part0 = " + json.dumps(rows) + ";"
        )
        out = read_transcript_archive(spark, str(f)).collect()
        assert len(out) == 3  # dup (c1,1) dropped
        assert [(r["conv_id"], r["turn_idx"]) for r in out] == [
            ("c0", 0), ("c1", 0), ("c1", 1)
        ]
        # both ts formats parsed
        assert all(r["ts"] is not None for r in out)

    def test_dm_turn_order_follows_parsed_timestamp(self, spark, tmp_path):
        """Legacy X timestamps ('Mon Jan 05 ...') sort by weekday name
        as raw strings — turn_idx must follow the PARSED chronology."""
        from xf_spark.sources.archive import read_dm_archive

        msgs = [
            {"messageCreate": {"id": "2", "senderId": "u1",
             "recipientId": "u2", "text": "second (april)",
             "createdAt": "Fri Apr 03 10:00:00 +0000 2026"}},
            {"messageCreate": {"id": "1", "senderId": "u2",
             "recipientId": "u1", "text": "first (january)",
             "createdAt": "Mon Jan 05 10:00:00 +0000 2026"}},
        ]
        f = tmp_path / "direct-messages-part0.js"
        f.write_text(
            "window.YTD.direct_messages.part0 = "
            + json.dumps([{"dmConversation": {"conversationId": "cA",
                                              "messages": msgs}}]) + ";"
        )
        out = read_dm_archive(spark, str(f)).orderBy("turn_idx").collect()
        assert [r["text"] for r in out] == ["first (january)", "second (april)"]
        assert [r["ts"].month for r in out] == [1, 4]

    def test_conversations_grouped_order(self, spark):
        tr = load_transcripts(spark, SCALE)
        grouped = conversations_grouped(tr)
        row = grouped.orderBy("conv_id").first()
        idxs = [m["turn_idx"] for m in row["messages"]]
        assert idxs == sorted(idxs)
        assert row["n_turns"] == len(idxs)


class TestCli:
    @pytest.fixture(scope="class")
    def cli_index(self, tmp_path_factory):
        fixture = ensure_transcripts_parquet(SCALE)
        out = str(tmp_path_factory.mktemp("cliidx"))
        env = dict(os.environ, PYTHONPATH="/root/repo")
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "index",
             "--input", fixture, "--out", out + "/idx", "--shards", "4",
             "--slices", "1"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "indexed 1512 turns" in r.stdout
        return out + "/idx", env

    def test_cli_search_json(self, cli_index):
        idx, env = cli_index
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "search",
             "machine", "--index", idx, "--mode", "lexical",
             "--limit", "3", "--format", "json"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout.strip().splitlines()[-1])
        assert len(payload) == 3
        assert all("score" in row for row in payload)

    def test_cli_search_synonyms_and_msm(self, cli_index):
        idx, env = cli_index
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "search",
             "ml", "--index", idx, "--mode", "lexical", "--limit", "3",
             "--synonyms", '{"ml": ["machine learning"]}',
             "--format", "json"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout.strip().splitlines()[-1])
        assert len(payload) == 3  # phrase synonym matched
        # guidance (not a traceback) when the mode can't honor the knob
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "search",
             "ml", "--index", idx, "--synonyms", '{"ml": ["ai"]}'],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 1 and "--mode lexical" in r.stdout
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "search",
             "machine rust learning", "--index", idx, "--mode", "lexical",
             "--min-should-match", "2", "--limit", "3", "--format", "json"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout.strip().splitlines()[-1])
        assert payload
        # malformed JSON is a friendly one-liner
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "search",
             "ml", "--index", idx, "--mode", "lexical",
             "--synonyms", "{bad json"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 1 and "bad --synonyms" in r.stdout

    def test_cli_facet_top_hits(self, cli_index):
        idx, env = cli_index
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "search",
             "machine", "--index", idx, "--facet", "role",
             "--top-hits", "2", "--format", "json"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout.strip().splitlines()[-1])
        assert payload and {"value", "n_docs", "rank", "doc_id", "score"} <= set(
            payload[0]
        )
        assert all(1 <= row["rank"] <= 2 for row in payload)
        # --top-hits without --facet is a friendly one-liner
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "search",
             "machine", "--index", idx, "--top-hits", "2"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 1 and "--facet" in r.stdout

    def test_cli_significant_terms_and_stats(self, cli_index):
        idx, env = cli_index
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "search",
             "machine", "--index", idx, "--significant-terms",
             "--limit", "5", "--format", "json"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout.strip().splitlines()[-1])
        assert payload and {"term", "n_match", "df", "lift"} == set(payload[0])
        assert len(payload) <= 5
        # lift-ranked descending
        lifts = [row["lift"] for row in payload]
        assert lifts == sorted(lifts, reverse=True)

        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "search",
             "machine", "--index", idx, "--stats", "text_len",
             "--format", "json"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout.strip().splitlines()[-1])
        assert len(payload) == 1
        row = payload[0]
        assert {"n", "min", "max", "avg", "sum", "p50", "p90", "p99"} <= set(row)
        assert row["n"] > 0 and row["min"] <= row["p50"] <= row["max"]

    def test_cli_rescore_and_decay(self, cli_index):
        idx, env = cli_index
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "search",
             "machine learning", "--index", idx, "--mode", "lexical",
             "--rescore", '"machine learning"', "--limit", "3",
             "--format", "json"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout.strip().splitlines()[-1])
        assert len(payload) == 3
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "search",
             "machine", "--index", idx, "--mode", "lexical",
             "--half-life", "30", "--limit", "3", "--format", "json"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout.strip().splitlines()[-1])
        assert len(payload) == 3
        # guidance paths
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "search",
             "machine", "--index", idx, "--half-life", "30"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 1 and "--mode lexical" in r.stdout
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "search",
             "machine", "--index", idx, "--mode", "lexical",
             "--half-life", "30", "--rescore", "x"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 1 and "mutually exclusive" in r.stdout

    def test_cli_demote(self, cli_index):
        idx, env = cli_index
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "search",
             "machine", "--index", idx, "--mode", "lexical",
             "--demote", "rust", "--demote-factor", "0.25",
             "--limit", "3", "--format", "json"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout.strip().splitlines()[-1])
        assert len(payload) == 3 and all("text" in row for row in payload)
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "search",
             "machine", "--index", idx, "--mode", "lexical",
             "--demote", "rust", "--rescore", "x"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 1 and "mutually exclusive" in r.stdout

    def test_cli_search_wildcard_fuzzy_syntax(self, cli_index):
        idx, env = cli_index
        for q in ("ma?hine", "machne~2", '"machine lear*"'):
            r = subprocess.run(
                [sys.executable, "-m", "xf_spark", "--cores", "4", "search",
                 q, "--index", idx, "--mode", "lexical", "--limit", "3",
                 "--format", "json"],
                capture_output=True, text=True, env=env, cwd="/root/repo",
                timeout=300,
            )
            assert r.returncode == 0, (q, r.stderr[-2000:])
            payload = json.loads(r.stdout.strip().splitlines()[-1])
            assert len(payload) == 3, q

    def test_cli_search_explain(self, cli_index):
        idx, env = cli_index
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "search",
             "machine learning", "--index", idx, "--limit", "3",
             "--explain", "--format", "json"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout.strip().splitlines()[-1])
        assert payload
        assert {"doc_id", "term", "field", "tf", "df", "idf", "contrib",
                "score"} <= set(payload[0])
        # per-doc contributions sum to the doc score
        by_doc = {}
        for row in payload:
            s, total = by_doc.get(row["doc_id"], (0.0, row["score"]))
            by_doc[row["doc_id"]] = (s + row["contrib"], total)
        for s, total in by_doc.values():
            assert abs(s - total) < 1e-6

    def test_cli_list_and_get(self, cli_index):
        # list conversations -> pick one -> get a turn, then the whole
        # conversation (the reference `tweet <id> [--thread]` analog)
        idx, env = cli_index
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "list",
             "conversations", "--index", idx, "--limit", "2",
             "--format", "json"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        convs = json.loads(r.stdout.strip().splitlines()[-1])
        assert len(convs) == 2 and convs[0]["n_turns"] >= convs[1]["n_turns"]
        conv_id = convs[0]["conv_id"]

        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "get",
             conv_id, "0", "--index", idx, "--format", "json"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        row = json.loads(r.stdout.strip().splitlines()[-1])
        assert len(row) == 1 and row[0]["conv_id"] == conv_id
        assert row[0]["turn_idx"] == 0 and row[0]["text"]

        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "get",
             conv_id, "0", "--index", idx, "--context"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        lines = [ln for ln in r.stdout.splitlines()
                 if ln[:2] in ("> ", "  ") and ln[2:].startswith("[")]
        assert len(lines) == convs[0]["n_turns"]
        assert sum(1 for ln in lines if ln.startswith(">")) == 1

    def test_cli_similar(self, cli_index):
        idx, env = cli_index
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "similar",
             "conv5000000000000", "0", "--index", idx, "--limit", "5",
             "--format", "json"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        rows = json.loads(r.stdout.strip().splitlines()[-1])
        assert len(rows) == 5
        assert all("score" in row for row in rows)
        assert not any(
            row["conv_id"] == "conv5000000000000" and row["turn_idx"] == 0
            for row in rows
        )

    def test_cli_get_missing_is_nonzero(self, cli_index):
        idx, env = cli_index
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "get",
             "no_such_conv", "0", "--index", idx],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 1
        assert "not found" in r.stdout

    def test_cli_list_roles(self, cli_index):
        idx, env = cli_index
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "list",
             "roles", "--index", idx, "--format", "json"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        roles = json.loads(r.stdout.strip().splitlines()[-1])
        assert {r_["role"] for r_ in roles} >= {"user", "assistant"}
        assert sum(r_["n_turns"] for r_ in roles) == 1512

    def test_cli_list_files_no_spark(self, tmp_path):
        # `list files` is a pure filesystem listing — no Spark session
        data = tmp_path / "data"
        data.mkdir()
        (data / "tweets.js").write_text("window.X = []")
        (data / "like.js").write_text("window.Y = []")
        env = dict(os.environ, PYTHONPATH="/root/repo")
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "list", "files",
             "--archive", str(tmp_path)],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=60,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "tweets.js" in r.stdout and "like.js" in r.stdout

    def test_cli_stats(self, cli_index):
        idx, env = cli_index
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "stats",
             "--index", idx],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        s = json.loads(r.stdout[r.stdout.index("{"):])
        assert s["n_turns"] == 1512


class TestTableResolution:
    """sources/tables.py: identifier vs path resolution (the Iceberg
    seam; no Iceberg jar in this sandbox, so identifier reads go to
    the session catalog and paths to parquet)."""

    def test_parquet_path_roundtrip(self, spark, tmp_path):
        from xf_spark.sources.tables import load_table, write_table
        from xf_spark.transcripts import load_transcripts

        p = str(tmp_path / "tbl")
        tr = load_transcripts(spark, 0.001)
        write_table(tr, p, mode="overwrite")
        assert load_table(spark, p).count() == tr.count()

    def test_identifier_uses_catalog(self, spark):
        from xf_spark.sources.tables import load_table
        from xf_spark.transcripts import load_transcripts

        load_transcripts(spark, 0.001).limit(7).createOrReplaceTempView("t7")
        # temp views resolve without a dot; a dotted identifier goes to
        # the catalog — create a real catalog table via SQL
        spark.sql("CREATE DATABASE IF NOT EXISTS xfdb")
        spark.sql("DROP TABLE IF EXISTS xfdb.turns7")
        spark.sql("CREATE TABLE xfdb.turns7 AS SELECT * FROM t7")
        try:
            assert load_table(spark, "xfdb.turns7").count() == 7
        finally:
            spark.sql("DROP TABLE IF EXISTS xfdb.turns7")

    def test_identifier_heuristic(self):
        from xf_spark.sources.tables import is_table_identifier

        assert is_table_identifier("db.table")
        assert is_table_identifier("catalog.db.table")
        assert not is_table_identifier("/root/testdata/sf0.01")
        assert not is_table_identifier("fixtures/transcripts_sf0.1.parquet")
        assert not is_table_identifier("plain_view")

    def test_transcript_contract_enforced(self, spark, tmp_path):
        from xf_spark.sources.tables import load_transcript_table

        p = str(tmp_path / "bad")
        spark.range(3).write.parquet(p)
        import pytest as _pt

        with _pt.raises(ValueError, match="missing columns"):
            load_transcript_table(spark, p)


class TestCliAppend:
    def test_cli_append_roundtrip(self, spark, tmp_path):
        """CLI: index a subset, append the rest, search sees both."""
        import pandas as pd

        fixture = ensure_transcripts_parquet(SCALE)
        pdf = pd.read_parquet(fixture)
        half = len(pdf) // 2
        p1, p2 = str(tmp_path / "p1.parquet"), str(tmp_path / "p2.parquet")
        pdf.iloc[:half].to_parquet(p1, index=False, coerce_timestamps="us",
                                   allow_truncated_timestamps=True)
        pdf.iloc[half:].to_parquet(p2, index=False, coerce_timestamps="us",
                                   allow_truncated_timestamps=True)
        idx = str(tmp_path / "idx")
        env = dict(os.environ, PYTHONPATH="/root/repo")

        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "index",
             "--input", p1, "--out", idx, "--shards", "4", "--slices", "1",
             "--no-embeddings"],
            capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]

        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "append",
             "--input", p2, "--index", idx],
            capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert f"appended {len(pdf) - half} turns" in r.stdout

        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "search",
             "machine", "--index", idx, "--mode", "lexical",
             "--limit", "3", "--format", "json"],
            capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        payload = json.loads(r.stdout.strip().splitlines()[-1])
        assert len(payload) == 3


class TestRepl:
    def test_repl_session(self, tmp_path):
        """Scripted REPL session: search -> refine -> show -> set ->
        more -> export -> stats -> quit (repl.rs command-set analog)."""
        fixture = ensure_transcripts_parquet(SCALE)
        idx = str(tmp_path / "idx")
        env = dict(os.environ, PYTHONPATH="/root/repo")
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "index",
             "--input", fixture, "--out", idx, "--shards", "4",
             "--slices", "1", "--no-embeddings"],
            capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        script = "\n".join([
            "set limit 3",
            "machine",
            "refine learning",
            "show 0",
            "more",
            "export json",
            # error resilience: each bad command prints and continues
            "set limit ten",          # non-int
            "set mode warp",          # invalid mode
            "set mode semantic",      # valid set...
            "machine",                # ...but engine raises (no embeddings)
            "set mode lexical",
            # fuzzy toggle: typo matches nothing exact, then resolves
            "machin",
            "set fuzzy maybe",        # invalid value
            "set fuzzy on",
            "machin",
            "explain machine",        # score breakdown rows
            'explain rust "machine learning"',  # nested phrase: refused
            "sig",                    # significant terms of the session query
            "stats",
            "quit",
        ]) + "\n"
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "repl",
             "--index", idx],
            input=script, capture_output=True, text=True, env=env,
            cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        out = r.stdout
        assert "limit = 3" in out
        assert "[" in out and "score=" in out        # results + show
        assert '"conv_id"' in out                    # export json
        assert "set limit: expected an integer" in out
        assert "set mode: expected one of" in out
        assert "error: index built without embeddings" in out
        # exact typo miss: zero hits, plus the did-you-mean hint
        # ('machin' sits at edit distance 1 of 'machine')
        assert "(no results — did you mean: machine)" in out
        assert "set fuzzy: expected on|off" in out
        assert "fuzzy = on" in out
        # post-toggle the typo resolves: a result line ("[<score>] (conv")
        # prints after the toggle confirmation
        assert out.rindex("] (conv") > out.rindex("fuzzy = on")
        assert "contrib" in out            # explain breakdown printed
        assert "explain: explain does not support phrases nested" in out
        # sig: significant-terms rows print as "term n_match df lift" —
        # 'fascinating' co-occurs with 'machine' in its pool sentence,
        # so it is always a top-lift term for the session query
        assert re.search(r"^fascinating\s+\d+\s+\d+\s+[\d.]+", out, re.M)
        assert "n_turns" in out            # stats — session survived all errors


class TestFormatters:
    """_format_rows is the CLI's five-format output surface; rows are
    dict-like (PySpark Row supports the same [col] access)."""

    ROWS = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": 'line1\nline2, "quoted"', "score": 0.5},
        {"conv_id": "c2", "turn_idx": 3, "role": "tool",
         "text": None, "score": 1.25},
    ]
    COLS = ["conv_id", "turn_idx", "role", "text", "score"]

    def test_json_preserves_types(self, capsys):
        from xf_spark.__main__ import _format_rows

        _format_rows(self.ROWS, "json", self.COLS)
        payload = json.loads(capsys.readouterr().out)
        assert payload[0]["turn_idx"] == 0          # int, not "0"
        assert payload[0]["score"] == 0.5           # float, not "0.5"
        assert payload[1]["text"] is None           # null, not "None"

    def test_csv_quotes_embedded_newlines_and_commas(self, capsys):
        import csv
        import io

        from xf_spark.__main__ import _format_rows

        _format_rows(self.ROWS, "csv", self.COLS)
        out = capsys.readouterr().out
        parsed = list(csv.reader(io.StringIO(out)))
        assert parsed[0] == self.COLS
        assert len(parsed) == 3                     # header + 2 records
        assert parsed[1][3] == 'line1\nline2, "quoted"'

    def test_context_rows_without_score_column(self, capsys):
        # --context output has no score column; text/compact must not
        # crash reading r['score']
        from xf_spark.__main__ import _format_rows

        cols = ["conv_id", "turn_idx", "role", "text", "is_match"]
        rows = [{"conv_id": "c1", "turn_idx": 0, "role": "user",
                 "text": "hello", "is_match": True}]
        _format_rows(rows, "text", cols)
        _format_rows(rows, "compact", cols)
        out = capsys.readouterr().out
        assert "[-]" in out and "c1/0 -" in out


class TestCliCompact:
    def test_cli_append_then_compact_and_purge(self, tmp_path_factory):
        """CLI surface: index -> append -> compact (slice merge) ->
        compact --drop (purge). Search still serves after each step."""
        fixture = ensure_transcripts_parquet(SCALE)
        root = str(tmp_path_factory.mktemp("clicpx"))
        idx = root + "/idx"
        env = dict(os.environ, PYTHONPATH="/root/repo")

        def run(*args, timeout=300):
            r = subprocess.run(
                [sys.executable, "-m", "xf_spark", "--cores", "4", *args],
                capture_output=True, text=True, env=env, cwd="/root/repo",
                timeout=timeout,
            )
            assert r.returncode == 0, r.stderr[-2000:]
            return r.stdout

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        full = pd.read_parquet(fixture)
        convs = sorted(full["conv_id"].unique())
        cut = convs[len(convs) // 2]
        p1, p2 = full[full["conv_id"] < cut], full[full["conv_id"] >= cut]
        pq.write_table(
            pa.Table.from_pandas(p1, preserve_index=False),
            root + "/p1.parquet", coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        pq.write_table(
            pa.Table.from_pandas(p2, preserve_index=False),
            root + "/p2.parquet", coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )

        run("index", "--input", root + "/p1.parquet", "--out", idx,
            "--shards", "4", "--slices", "1", "--no-embeddings")
        run("append", "--input", root + "/p2.parquet", "--index", idx)
        out = run("compact", "--index", idx)
        assert "compacted 2 -> 1 slice(s)" in out

        # purge: drop half the surviving doc ids via a parquet list
        import json as _json

        meta = _json.load(open(os.path.join(idx, "meta.json")))
        n = meta["n_docs"]
        drop_pdf = pd.DataFrame({"doc_id": list(range(0, n, 2))})
        pq.write_table(
            pa.Table.from_pandas(drop_pdf, preserve_index=False),
            root + "/drop.parquet",
        )
        out = run("compact", "--index", idx, "--drop", root + "/drop.parquet")
        assert f"purged {len(drop_pdf)} docs" in out

        out = run("search", "machine", "--index", idx, "--mode", "lexical",
                  "--limit", "3", "--format", "json")
        payload = json.loads(out.strip().splitlines()[-1])
        assert len(payload) == 3


class TestCliCurate:
    def test_cli_curate_exact(self, tmp_path):
        """curate subcommand: quality gate + exact dedup over the
        driver's documents table, kept rows written as parquet and the
        stage counts printed."""
        out = str(tmp_path / "kept.parquet")
        env = dict(os.environ, PYTHONPATH="/root/repo")
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", "curate",
             "--input", "/root/testdata/sf0.001/documents.parquet",
             "--out", out, "--min-quality", "0.6", "--dedup", "exact"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("curated")][-1]
        # counts in the message must agree with the written store
        import re

        m = re.match(r"curated (\d+) -> (\d+) rows", line)
        assert m, line
        import duckdb

        n = duckdb.sql(f"SELECT count(*) FROM '{out}/*.parquet'").fetchone()[0]
        assert n == int(m.group(2)) and 0 < n < int(m.group(1))


class TestCliIceberg:
    """CLI over the Iceberg surface: `index` auto-detects a table root
    (build_iceberg → snapshot recorded), `sync` appends the manifest
    diff, and the sparkless `table` maintenance subcommands."""

    def _run(self, args, env):
        r = subprocess.run(
            [sys.executable, "-m", "xf_spark", *args],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]
        return r.stdout

    def test_index_sync_and_table_ops(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from xf_spark.sources import iceberg as ice
        from xf_spark.transcripts import load_transcripts

        env = dict(os.environ, PYTHONPATH="/root/repo")
        table, idx = str(tmp_path / "tbl"), str(tmp_path / "idx")
        tr = load_transcripts(spark, SCALE)
        ice.write_iceberg(tr.where(F.col("turn_idx") < 10), table)

        out = self._run(
            ["--cores", "4", "index", "--input", table, "--out", idx,
             "--shards", "4", "--slices", "1", "--no-embeddings"],
            env,
        )
        assert "indexed" in out

        ice.write_iceberg(tr.where(F.col("turn_idx") >= 10), table)
        out = self._run(
            ["--cores", "4", "sync", "--table", table, "--index", idx],
            env,
        )
        assert "synced" in out and "synced 0" not in out

        out = self._run(["table", "snapshots", "--table", table], env)
        lines = [ln for ln in out.splitlines() if ln.strip()]
        assert len(lines) == 2 and sum(
            1 for ln in lines if ln.startswith("*")
        ) == 1

        out = self._run(
            ["table", "expire", "--table", table, "--keep", "1"], env
        )
        assert "expired 1 snapshot(s)" in out

        out = self._run(["table", "orphans", "--table", table], env)
        assert "removed 0 orphan dir(s)" in out
