"""Tests: stats/analytics surface, date grammar, context expansion,
snippets, sorts, lookups."""

from __future__ import annotations

import datetime as dt

import pytest

from xf_spark.analytics import stats as S
from xf_spark.index.builder import build_engine
from xf_spark.query.dates import parse_date_flexible, parse_date_range
from xf_spark.query.results import (
    add_snippets,
    apply_sort,
    conversation_context,
    get_by_id,
    get_by_ids,
)
from xf_spark.transcripts import load_transcripts

SCALE = 0.001
NOW = dt.datetime(2026, 8, 16, 12, 0, 0)


@pytest.fixture(scope="module")
def built(spark):
    transcripts = load_transcripts(spark, SCALE)
    engine = build_engine(transcripts)
    rows = transcripts.collect()
    return engine, transcripts, rows


class TestStats:
    def test_archive_stats(self, built):
        engine, transcripts, rows = built
        r = S.archive_stats(transcripts).first()
        assert r["n_turns"] == len(rows)
        assert r["n_conversations"] == len({x["conv_id"] for x in rows})
        assert r["n_user"] == sum(1 for x in rows if x["role"] == "user")
        assert r["first_ts"] == min(x["ts"] for x in rows)

    def test_daily_counts_sum(self, built):
        _, transcripts, rows = built
        got = S.daily_counts(transcripts).collect()
        assert sum(r["n"] for r in got) == len(rows)
        days = [r["day"] for r in got]
        assert days == sorted(days)

    def test_hourly_distribution(self, built):
        _, transcripts, rows = built
        got = {r["hour"]: r["n"] for r in S.hourly_distribution(transcripts).collect()}
        import collections

        want = collections.Counter(x["ts"].hour for x in rows)
        assert got == dict(want)

    def test_dow_sunday_zero(self, built):
        _, transcripts, rows = built
        got = {r["dow"]: r["n"] for r in S.dow_distribution(transcripts).collect()}
        import collections

        # python weekday(): Mon=0..Sun=6 -> Sun=0 mapping: (wd+1)%7
        want = collections.Counter((x["ts"].weekday() + 1) % 7 for x in rows)
        assert got == dict(want)

    def test_longest_gap(self, built):
        _, transcripts, rows = built
        days = sorted({x["ts"].date() for x in rows})
        want = max(
            (b - a).days for a, b in zip(days, days[1:])
        ) if len(days) > 1 else None
        got = S.longest_gap_days(transcripts).first()["max_gap_days"]
        assert got == want

    def test_conversation_summaries(self, built):
        _, transcripts, rows = built
        got = {r["conv_id"]: r for r in S.conversation_summaries(transcripts).collect()}
        conv = rows[0]["conv_id"]
        mine = [x for x in rows if x["conv_id"] == conv]
        assert got[conv]["n_turns"] == len(mine)
        assert got[conv]["roles"] == sorted({x["role"] for x in mine})

    def test_histograms_cover_all(self, built):
        _, transcripts, rows = built
        lh = S.length_histogram(transcripts).collect()
        assert sum(r["n"] for r in lh) == len(rows)
        # buckets come back in ascending LENGTH order, not
        # lexicographic label order ('141-280' < '51-140' as strings)
        order = {"0-50": 0, "51-140": 1, "141-280": 2, "280+": 3}
        keys = [order[r["bucket"]] for r in lh]
        assert keys == sorted(keys)
        th = S.turns_per_conversation_histogram(transcripts).collect()
        assert sum(r["n"] for r in th) == len({x["conv_id"] for x in rows})

    def test_activity_summary_empty_input_keeps_one_row(self, spark, built):
        # the reference always returns a stats struct; an empty corpus
        # must yield one row of zero/null fields, not zero rows (the
        # old crossJoin with the empty limit(1) top frames annihilated
        # the aggregate row)
        _, transcripts, _ = built
        empty = transcripts.limit(0)
        row = S.activity_summary(empty).collect()
        assert len(row) == 1
        assert row[0]["active_days"] == 0
        assert row[0]["most_active_day"] is None

    def test_top_tools(self, built):
        _, transcripts, rows = built
        got = S.top_tools(transcripts, limit=3).collect()
        import collections

        want = collections.Counter(
            x["tool"].lower() for x in rows if x["tool"]
        ).most_common()
        assert got[0]["n"] == want[0][1]

    def test_median(self, built):
        _, transcripts, rows = built
        r = S.median_turn_length(transcripts).first()
        assert r["p50_chars"] > 0


class TestDates:
    def test_chrono_english_long_tail(self):
        """date_parser.rs:130-136 chrono-english fallback, long-tail
        forms: articles, fortnights, ordinal days, beginning/end-of."""
        base = dt.datetime(2026, 8, 16, 12, 0, 0)  # a Sunday
        lo, hi = parse_date_range("a fortnight ago", now=base)
        assert lo.date() == dt.date(2026, 8, 2) and hi.date() == lo.date()
        lo, _ = parse_date_range("a week ago", now=base)
        assert lo.date() == dt.date(2026, 8, 9)
        lo, hi = parse_date_range("last 2 fortnights", now=base)
        assert lo.date() == dt.date(2026, 7, 19) and hi.date() == base.date()
        # ordinal day-of-month forms
        for expr in ("june 3rd", "the 3rd of june", "3rd of june", "3 june"):
            lo, hi = parse_date_range(expr, now=base)
            assert lo.date() == dt.date(2026, 6, 3), expr
            assert hi.date() == dt.date(2026, 6, 3), expr
        lo, _ = parse_date_range("the 21st of december 2024", now=base)
        assert lo.date() == dt.date(2024, 12, 21)
        lo, _ = parse_date_range("june 1st, 2024", now=base)
        assert lo.date() == dt.date(2024, 6, 1)
        # beginning/start/end of <expr>
        lo, hi = parse_date_range("beginning of june", now=base)
        assert lo.date() == dt.date(2026, 6, 1) and hi.date() == lo.date()
        lo, _ = parse_date_range("end of last year", now=base)
        assert lo.date() == dt.date(2025, 12, 31)
        lo, _ = parse_date_range("start of q2 2024", now=base)
        assert lo.date() == dt.date(2024, 4, 1)
        lo, _ = parse_date_range("end of this month", now=base)
        assert lo.date() == dt.date(2026, 8, 31)

    def test_chrono_english_round5_forms(self):
        """now / tomorrow / weekend qualifiers / future offsets / US
        slash dates (chrono-english Dialect::Us)."""
        base = dt.datetime(2026, 8, 16, 12, 0, 0)  # a Sunday
        lo, hi = parse_date_range("now", now=base)
        assert lo == base and hi == base
        lo, hi = parse_date_range("tomorrow", now=base)
        assert lo.date() == dt.date(2026, 8, 17) and hi.date() == lo.date()
        # this weekend == weekend (most recent Sat-Sun on/before today:
        # Sat 15 - Sun 16); last weekend is the pair before
        lo, hi = parse_date_range("this weekend", now=base)
        assert lo.date() == dt.date(2026, 8, 15)
        assert hi.date() == dt.date(2026, 8, 16)
        lo, hi = parse_date_range("last weekend", now=base)
        assert lo.date() == dt.date(2026, 8, 8)
        assert hi.date() == dt.date(2026, 8, 9)
        # future offsets
        for expr in ("in 2 weeks", "2 weeks from now", "2 weeks hence"):
            lo, hi = parse_date_range(expr, now=base)
            assert lo.date() == dt.date(2026, 8, 30), expr
        lo, _ = parse_date_range("in 1 month", now=dt.datetime(2026, 12, 15))
        assert lo.date() == dt.date(2027, 1, 15)
        lo, _ = parse_date_range("in 6 months", now=base)
        assert lo.date() == dt.date(2027, 2, 16)
        lo, _ = parse_date_range("3 days hence", now=base)
        assert lo.date() == dt.date(2026, 8, 19)
        # US slash dates: month/day/year, 2-digit pivot at 70
        lo, hi = parse_date_range("6/15/2024", now=base)
        assert lo.date() == dt.date(2024, 6, 15) and hi.date() == lo.date()
        lo, _ = parse_date_range("6/15/24", now=base)
        assert lo.date() == dt.date(2024, 6, 15)
        lo, _ = parse_date_range("12/31/99", now=base)
        assert lo.date() == dt.date(1999, 12, 31)
        # outside the documented subset: still errors loudly
        import pytest as _pytest

        with _pytest.raises(ValueError):
            parse_date_range("teatime", now=base)

    def test_time_of_day_points(self):
        """date_parser.rs:141-147: has_explicit_time -> the result is
        a POINT (lo == hi == the instant), never a day range."""
        base = dt.datetime(2026, 8, 16, 12, 0, 0)  # a Sunday
        lo, hi = parse_date_range("8pm", now=base)
        assert lo == hi == dt.datetime(2026, 8, 16, 20, 0)
        lo, hi = parse_date_range("8:30pm", now=base)
        assert lo == hi == dt.datetime(2026, 8, 16, 20, 30)
        lo, hi = parse_date_range("16:30", now=base)
        assert lo == hi == dt.datetime(2026, 8, 16, 16, 30)
        lo, hi = parse_date_range("12am", now=base)
        assert lo == hi == dt.datetime(2026, 8, 16, 0, 0)
        lo, hi = parse_date_range("12pm", now=base)
        assert lo == hi == dt.datetime(2026, 8, 16, 12, 0)
        lo, hi = parse_date_range("noon", now=base)
        assert lo == hi == dt.datetime(2026, 8, 16, 12, 0)
        lo, hi = parse_date_range("midnight", now=base)
        assert lo == hi == dt.datetime(2026, 8, 16, 0, 0)
        # attached to a date expression, with or without "at"
        lo, hi = parse_date_range("june 3 at 4pm", now=base)
        assert lo == hi == dt.datetime(2026, 6, 3, 16, 0)
        lo, hi = parse_date_range("june 3, 2024 at 4:05:06pm", now=base)
        assert lo == hi == dt.datetime(2024, 6, 3, 16, 5, 6)
        # "friday 8pm": bare weekday = next occurrence (Fri Aug 21)
        lo, hi = parse_date_range("friday 8pm", now=base)
        assert lo == hi == dt.datetime(2026, 8, 21, 20, 0)
        lo, hi = parse_date_range("yesterday at noon", now=base)
        assert lo == hi == dt.datetime(2026, 8, 15, 12, 0)
        lo, hi = parse_date_range("2024-06-15 16:30", now=base)
        assert lo == hi == dt.datetime(2024, 6, 15, 16, 30)
        # flexible: since/until both resolve to the same point
        assert parse_date_flexible(
            "8pm", end=True, now=base
        ) == parse_date_flexible("8pm", end=False, now=base)
        # sub-day relative offsets anchor on ``now`` itself
        lo, hi = parse_date_range("2 hours ago", now=base)
        assert lo == hi == dt.datetime(2026, 8, 16, 10, 0)
        lo, hi = parse_date_range("an hour ago", now=base)
        assert lo == hi == dt.datetime(2026, 8, 16, 11, 0)
        lo, hi = parse_date_range("in 30 minutes", now=base)
        assert lo == hi == dt.datetime(2026, 8, 16, 12, 30)
        lo, hi = parse_date_range("45 seconds ago", now=base)
        assert lo == hi == dt.datetime(2026, 8, 16, 11, 59, 15)
        lo, hi = parse_date_range("3 hours from now", now=base)
        assert lo == hi == dt.datetime(2026, 8, 16, 15, 0)
        # invalid times stay loud
        import pytest as _pytest

        for bad in ("25:00", "13pm", "0am", "12:61"):
            with _pytest.raises(ValueError):
                parse_date_range(bad, now=base)
        # day-only expressions keep their day-range semantics
        lo, hi = parse_date_range("june 3", now=base)
        assert lo.date() == hi.date() == dt.date(2026, 6, 3)
        assert lo.time() == dt.time(0, 0) and hi.hour == 23

    def test_year_offsets_clamp_leap_day(self):
        from xf_spark.query.dates import parse_date_range

        lo, hi = parse_date_range("2 years ago", now=dt.datetime(2028, 2, 29))
        assert lo.date() == dt.date(2026, 2, 28)
        lo, hi = parse_date_range("last 1 year", now=dt.datetime(2028, 2, 29))
        assert lo.date() == dt.date(2027, 2, 28)
        assert hi.date() == dt.date(2028, 2, 29)
        lo, _ = parse_date_range("3 months ago", now=dt.datetime(2024, 5, 31))
        assert lo.date() == dt.date(2024, 2, 29)  # clamped to Feb length

    def test_rfc3339_forms(self):
        from xf_spark.query.dates import parse_date_range

        lo, hi = parse_date_range("2024-03-05T12:00:00Z")
        assert lo == dt.datetime(2024, 3, 5, 12, 0) and lo == hi
        lo, _ = parse_date_range("2024-03-05T12:00:00.123+02:00")
        assert lo == dt.datetime(2024, 3, 5, 10, 0, 0, 123000)  # UTC

    def test_iso_date(self):
        assert parse_date_flexible("2024-03-05") == dt.datetime(2024, 3, 5)
        assert parse_date_flexible("2024-03-05", end=True) == dt.datetime(
            2024, 3, 5, 23, 59, 59, 999999
        )

    def test_year_month(self):
        lo, hi = parse_date_range("2024-02")
        assert lo == dt.datetime(2024, 2, 1)
        assert hi.day == 29  # leap year

    def test_quarter(self):
        lo, hi = parse_date_range("q2 2024")
        assert lo == dt.datetime(2024, 4, 1) and hi.month == 6 and hi.day == 30

    def test_winter_spans_year(self):
        lo, hi = parse_date_range("winter 2023")
        assert lo == dt.datetime(2023, 12, 1)
        assert hi.year == 2024 and hi.month == 2 and hi.day == 29

    def test_month_year(self):
        lo, hi = parse_date_range("january 2025")
        assert lo == dt.datetime(2025, 1, 1) and hi.day == 31

    def test_relative(self):
        lo, hi = parse_date_range("yesterday", now=NOW)
        assert lo.date() == dt.date(2026, 8, 15)
        lo, _ = parse_date_range("last 3 days", now=NOW)
        assert lo.date() == dt.date(2026, 8, 13)
        lo, hi = parse_date_range("2 months ago", now=NOW)
        assert lo.date() == dt.date(2026, 6, 16)

    def test_weekend(self):
        # NOW = 2026-08-16 (Sunday) -> most recent Saturday is 08-15
        lo, hi = parse_date_range("weekend", now=NOW)
        assert lo.date() == dt.date(2026, 8, 15) and lo.date().weekday() == 5
        assert hi.date() == dt.date(2026, 8, 16)
        # from a Wednesday the previous weekend is returned
        wed = dt.datetime(2026, 8, 12)
        lo, hi = parse_date_range("weekend", now=wed)
        assert (lo.date(), hi.date()) == (dt.date(2026, 8, 8), dt.date(2026, 8, 9))

    def test_weekdays(self):
        # Sunday -> full Mon..Fri of this week (date_parser.rs:328-337)
        lo, hi = parse_date_range("weekdays", now=NOW)
        assert (lo.date(), hi.date()) == (dt.date(2026, 8, 10), dt.date(2026, 8, 14))
        # Wednesday -> Mon..today
        wed = dt.datetime(2026, 8, 12)
        lo, hi = parse_date_range("weekday", now=wed)
        assert (lo.date(), hi.date()) == (dt.date(2026, 8, 10), dt.date(2026, 8, 12))

    def test_this_week(self):
        # NOW = 2026-08-16 (Sunday) -> Mon 08-10 .. Sun 08-16; symmetric
        # with last/next week (review finding: 'this week' used to raise)
        lo, hi = parse_date_range("this week", now=NOW)
        assert (lo.date(), hi.date()) == (dt.date(2026, 8, 10), dt.date(2026, 8, 16))
        wed = dt.datetime(2026, 8, 12)
        lo, hi = parse_date_range("this week", now=wed)
        assert (lo.date(), hi.date()) == (dt.date(2026, 8, 10), dt.date(2026, 8, 16))

    def test_past_synonym(self):
        assert parse_date_range("past week", now=NOW) == parse_date_range(
            "last week", now=NOW
        )
        assert parse_date_range("past 3 days", now=NOW) == parse_date_range(
            "last 3 days", now=NOW
        )

    def test_named_weekdays(self):
        # NOW = 2026-08-16 (Sunday). chrono-english orientation
        # (date_parser.rs:130-136): bare/next = strictly after today,
        # last = strictly before, this = current Mon-based week.
        lo, _ = parse_date_range("tuesday", now=NOW)
        assert lo.date() == dt.date(2026, 8, 18)
        lo, _ = parse_date_range("next sunday", now=NOW)
        assert lo.date() == dt.date(2026, 8, 23)  # strictly after
        lo, _ = parse_date_range("last tuesday", now=NOW)
        assert lo.date() == dt.date(2026, 8, 11)
        lo, _ = parse_date_range("last sunday", now=NOW)
        assert lo.date() == dt.date(2026, 8, 9)  # strictly before
        lo, _ = parse_date_range("this tuesday", now=NOW)
        assert lo.date() == dt.date(2026, 8, 11)
        lo, _ = parse_date_range("fri", now=NOW)
        assert lo.date() == dt.date(2026, 8, 21)

    def test_next_units(self):
        lo, hi = parse_date_range("next week", now=NOW)
        assert (lo.date(), hi.date()) == (dt.date(2026, 8, 17), dt.date(2026, 8, 23))
        lo, hi = parse_date_range("next month", now=NOW)
        assert (lo.date(), hi.date()) == (dt.date(2026, 9, 1), dt.date(2026, 9, 30))
        lo, hi = parse_date_range("next year", now=NOW)
        assert lo.year == 2027 and hi == dt.datetime(2027, 12, 31, 23, 59, 59, 999999)

    def test_bare_month_and_month_day(self):
        lo, hi = parse_date_range("june", now=NOW)
        assert (lo.date(), hi.date()) == (dt.date(2026, 6, 1), dt.date(2026, 6, 30))
        lo, hi = parse_date_range("june 3", now=NOW)
        assert lo.date() == hi.date() == dt.date(2026, 6, 3)
        lo, _ = parse_date_range("june 3, 2024", now=NOW)
        assert lo.date() == dt.date(2024, 6, 3)
        lo, _ = parse_date_range("3 june 2024", now=NOW)
        assert lo.date() == dt.date(2024, 6, 3)
        assert parse_date_flexible("june 3 2024", end=True) == dt.datetime(
            2024, 6, 3, 23, 59, 59, 999999
        )

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            parse_date_flexible("next fortnight-ish")
        with pytest.raises(ValueError):
            parse_date_flexible("two weeks ago tuesday")


class TestResults:
    def test_conversation_context(self, built):
        engine, transcripts, rows = built
        hits = engine.search("machine", limit=5)
        ctx = conversation_context(engine.docs, hits).collect()
        assert any(r["is_match"] for r in ctx)
        # full conversations included, stable order, text preserved
        convs = {r["conv_id"] for r in ctx}
        by_conv = {}
        for r in rows:
            by_conv.setdefault(r["conv_id"], []).append(r)
        got_by_conv = {}
        for r in ctx:
            got_by_conv.setdefault(r["conv_id"], []).append(r)
        for c in convs:
            want = sorted(by_conv[c], key=lambda x: x["turn_idx"])
            got = got_by_conv[c]
            assert [g["turn_idx"] for g in got] == [w["turn_idx"] for w in want]
            assert [g["text"] for g in got] == [w["text"] for w in want]

    def test_get_by_id(self, built):
        engine, _, rows = built
        r0 = rows[0]
        got = get_by_id(engine.docs, r0["conv_id"], r0["turn_idx"]).collect()
        assert len(got) == 1 and got[0]["text"] == r0["text"]

    def test_get_by_ids_order_preserved_with_none_rows(self, built):
        # search.rs:683-746 returns Vec<Option<_>>: one slot per
        # request, None (null doc columns) for misses, input order
        engine, _, rows = built
        ids = [(rows[5]["conv_id"], rows[5]["turn_idx"]),
               ("convNOPE", 0),
               (rows[0]["conv_id"], rows[0]["turn_idx"])]
        got = get_by_ids(engine.docs, ids).collect()
        assert len(got) == 3
        assert got[0]["text"] == rows[5]["text"]
        assert got[1]["text"] is None and got[1]["conv_id"] == "convNOPE"
        assert got[2]["text"] == rows[0]["text"]
        assert [g["req_order"] for g in got] == [0, 1, 2]

    def test_get_by_ids_plan_never_shuffles_docs(self, built):
        # the preserved side of a LEFT join can't broadcast, so the
        # old req.join(docs, "left") planned a SortMergeJoin over the
        # FULL doc store; the rewrite (pruned scan + broadcast inner +
        # unioned miss rows) must keep the plan shuffle-free
        engine, _, rows = built
        ids = [(rows[5]["conv_id"], rows[5]["turn_idx"]), ("convNOPE", 0)]
        plan = get_by_ids(engine.docs, ids)._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan
        assert "BroadcastHashJoin" in plan

    def test_get_by_ids_none_conv_id_is_a_miss(self, built):
        # a None conv_id in the request is a miss slot (Vec<Option<_>>
        # semantics), not a TypeError from sorting the prune list
        engine, _, rows = built
        ids = [(None, 0), (rows[0]["conv_id"], rows[0]["turn_idx"])]
        got = get_by_ids(engine.docs, ids).collect()
        assert len(got) == 2
        assert got[0]["text"] is None and got[0]["conv_id"] is None
        assert got[1]["text"] == rows[0]["text"]
        # all-None request list must also work (empty prune set)
        only_none = get_by_ids(engine.docs, [(None, 1)]).collect()
        assert len(only_none) == 1 and only_none[0]["text"] is None

    def test_snippets_highlight(self, built):
        engine, _, _ = built
        hyd = engine.search_hydrated("machine", limit=5)
        rows = add_snippets(hyd, "machine").collect()
        assert rows
        assert all("<b>" in r["snippet"].lower() for r in rows)

    def test_snippet_matches_snake_case_identifiers(self, built, spark):
        # the tokenizer splits on [\W_]+ so 'conv_id' indexes as
        # (conv, id) — the snippet matcher must use the same token
        # boundary, not regex \b (which treats '_' as a word char and
        # missed the hit entirely)
        engine, _, _ = built
        hyd = spark.createDataFrame(
            [(1, "the conv_id column holds the id")], "doc_id long, text string"
        )
        rows = add_snippets(hyd, "conv").collect()
        assert rows[0]["snippet"].startswith("the <b>conv</b>_id")
        # but no partial-token match: 'conv' inside 'conversation' stays unmarked
        hyd2 = spark.createDataFrame(
            [(1, "a conversation about nothing")], "doc_id long, text string"
        )
        rows2 = add_snippets(hyd2, "conv").collect()
        assert "<b>" not in rows2[0]["snippet"]

    def test_phrase_requires_positions(self, built):
        # an engine built without positions must reject phrase queries
        # with a clear error, not an unresolved-column AnalysisException
        from xf_spark.index.builder import build_engine

        _, transcripts, _ = built
        eng = build_engine(transcripts, with_positions=False, with_prefix=False)
        with pytest.raises(ValueError, match="positions"):
            eng.search('"machine learning"')

    def test_sorts(self, built):
        engine, _, _ = built
        hyd = engine.search_hydrated("rust", limit=10)
        by_date = apply_sort(hyd, "date").collect()
        ts = [r["ts"] for r in by_date]
        assert ts == sorted(ts)
        by_eng = apply_sort(hyd, "engagement").collect()
        lens = [len(r["text"]) for r in by_eng]
        assert lens == sorted(lens, reverse=True)


class TestSparkline:
    """Terminal sparkline rendering (stats_analytics.rs:916-1001);
    pure-python semantics pinned against the reference's own tests."""

    def test_empty_and_zero_width(self):
        assert S.sparkline([], 10) == ""
        assert S.sparkline([1, 2], 0) == ""

    def test_single_value_is_max(self):
        assert S.sparkline([5], 1) == "█"

    def test_scaling_and_floor(self):
        out = S.sparkline([1, 5, 10, 8, 3, 1], 10)
        assert len(out) == 6
        assert out[2] == "█"  # the max
        assert out[0] == S._BLOCKS[int(1 / 10 * 7)]
        # all-zero series renders the floor glyph
        assert S.sparkline([0, 0, 0], 10) == "▁▁▁"

    def test_bucketing_integer_average(self):
        # 6 values into width 3 -> ceil-div bucket size 2, int avg
        out = S.sparkline([0, 10, 10, 10, 4, 6], 3)
        assert len(out) == 3
        # buckets: 5, 10, 5 -> glyphs scale against bucketed max 10
        assert out[1] == "█"
        assert out[0] == out[2] == S._BLOCKS[int(5 / 10 * 7)]

    def test_daily_sparkline_fills_gaps(self, built):
        engine, transcripts, rows = built
        daily = S.daily_counts(transcripts)
        n_days = daily.count()
        line = S.sparkline_from_daily(daily, 50)
        assert 0 < len(line) <= 50
        # span >= active days, so a sparse corpus still renders wide
        import datetime as _dt

        d = sorted({x["ts"].date() for x in rows})
        span = (d[-1] - d[0]).days + 1
        assert len(line) == min(span, 50) and span >= n_days

    def test_hourly_and_dow_formats(self, built):
        engine, transcripts, rows = built
        hl = S.format_hourly_sparkline(S.hourly_distribution(transcripts))
        assert len(hl) == 24 and set(hl) <= set(S._BLOCKS)
        chart = S.format_dow_distribution(S.dow_distribution(transcripts))
        lines = chart.splitlines()
        assert len(lines) == 7 and lines[0].startswith("Sun: ")
        # the busiest weekday carries the full 10-block bar
        assert any(line.endswith("█" * 10) for line in lines)
