"""Per-op perf budget enforcement (perf.rs:25-178 analog): budgets are
graded at runtime (logged), surfaced by doctor, and ENFORCED here — a
warm serving query grading `critical` fails CI. Thresholds sit above
this host's measured ±3x wall-time noise, so the gate catches order-
of-magnitude regressions (the lost-driver-fast-path / lost-term-cache
failure mode), not scheduler jitter."""

from __future__ import annotations

import pytest

from xf_spark import perf
from xf_spark.transcripts import load_transcripts


class TestBudgetUnit:
    def test_grades(self):
        b = perf.Budget("x", 10, 100, 1000)
        assert b.grade(5) == "within"
        assert b.grade(50) == "acceptable"
        assert b.grade(500) == "warning"
        assert b.grade(5000) == "critical"

    def test_record_and_timed(self):
        g = perf.record("search_simple", 10.0)  # 10 s -> critical
        assert g == "critical"
        with perf.timed("search_simple"):
            pass
        ms, g = perf.LAST["search_simple"]
        assert g == "within" and ms < perf.BUDGETS["search_simple"].target_ms

    def test_plan_budget_mapping(self):
        from xf_spark.query.parser import parse_query

        assert perf.budget_for_plan(parse_query("rust"), False) == "search_simple"
        assert perf.budget_for_plan(parse_query('"a b"'), False) == "search_phrase"
        assert perf.budget_for_plan(parse_query("a AND b"), False) == "search_complex"
        assert perf.budget_for_plan(parse_query("pro*"), False) == "search_wildcard"
        assert perf.budget_for_plan(parse_query("rust"), True) == "search_filtered"


class TestServingBudgetsEnforced:
    @pytest.fixture(scope="class")
    def ix(self, spark, tmp_path_factory):
        from xf_spark.engine import XfIndex

        path = str(tmp_path_factory.mktemp("perfidx"))
        tr = load_transcripts(spark, 0.001)
        full = XfIndex.build(
            tr, path, with_embeddings=False, n_shards=4, n_buckets=16, slices=1
        )
        ix = full.segment_index.cache()
        ix.search("machine", limit=5).collect()  # warm workers + LRU
        return ix

    @pytest.mark.parametrize(
        "query,kw",
        [
            ("machine", {}),
            ('"machine learning"', {}),
            ("rust AND async", {}),
            ("progr*", {}),
            ("machine", {"roles": ["assistant"]}),
        ],
        ids=["simple", "phrase", "complex", "wildcard", "filtered"],
    )
    def test_warm_query_not_critical(self, ix, query, kw):
        ix.search(query, limit=10, **kw).collect()  # warm this shape
        ix.search(query, limit=10, **kw).collect()
        from xf_spark.query.parser import parse_query

        name = perf.budget_for_plan(parse_query(query), bool(kw))
        ms, grade = perf.LAST[name]
        assert grade != "critical", (name, ms)

    def test_msearch_budget_recorded(self, ix):
        ix.search_many(["machine", "rust"], limit=10)
        ix.search_many(["machine", "rust"], limit=10)
        ms, grade = perf.LAST["msearch_per_query"]
        assert grade != "critical", ms

    def test_doctor_reports_perf_grade(self, spark, ix):
        from xf_spark.doctor import run_doctor

        checks = {c.name: c for c in run_doctor(spark, ix.path)}
        assert "perf_budget" in checks
        assert checks["perf_budget"].ok
