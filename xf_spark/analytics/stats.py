"""Stats/analytics surface over the transcripts table.

The Spark re-expression of the reference's stats_analytics.rs — every
aggregation is built-in Spark SQL (JVM-side, whole-stage codegen); no
UDFs anywhere in this module. Each function cites the reference
operator it mirrors (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def archive_stats(transcripts: DataFrame) -> DataFrame:
    """Global counts + date bounds in ONE aggregate (the reference
    issues 11 scalar subqueries in one row, storage.rs:767-800)."""
    return transcripts.agg(
        F.count("*").alias("n_turns"),
        F.countDistinct("conv_id").alias("n_conversations"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("n_user"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias(
            "n_assistant"
        ),
        F.sum(F.when(F.col("role") == "tool", 1).otherwise(0)).alias("n_tool"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.round(F.avg(F.length("text")), 4).alias("avg_text_chars"),
    )


def daily_counts(transcripts: DataFrame) -> DataFrame:
    """GROUP BY DATE (stats_analytics.rs:121-127)."""
    return (
        transcripts.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .orderBy("day")
    )


def hourly_distribution(transcripts: DataFrame) -> DataFrame:
    """GROUP BY hour (stats_analytics.rs:153-159)."""
    return (
        transcripts.groupBy(F.hour("ts").cast("long").alias("hour"))
        .agg(F.count("*").alias("n"))
        .orderBy("hour")
    )


def dow_distribution(transcripts: DataFrame) -> DataFrame:
    """Day-of-week, Sunday=0 (stats_analytics.rs:186-195)."""
    return (
        transcripts.groupBy((F.dayofweek("ts") - 1).cast("long").alias("dow"))
        .agg(F.count("*").alias("n"))
        .orderBy("dow")
    )


def longest_gap_days(transcripts: DataFrame) -> DataFrame:
    """Max gap between consecutive active days via lag window
    (find_longest_gap, stats_analytics.rs:198-219)."""
    days = transcripts.select(F.to_date("ts").alias("day")).distinct()
    w = Window.orderBy("day")
    return (
        days.withColumn("gap", F.datediff("day", F.lag("day").over(w)))
        .agg(F.max("gap").cast("long").alias("max_gap_days"))
    )


def activity_summary(transcripts: DataFrame) -> DataFrame:
    """Derived activity metrics in ONE row (stats_analytics.rs:74-99):
    most-active day + count, most-active hour + count, active-day
    count, avg turns per active day, total days in range. One pass
    over the daily/hourly aggregates (themselves single shuffles);
    ties broken to the EARLIEST day/hour (max_by_key keeps the first
    max in iteration order, which is date/hour order here)."""
    daily = daily_counts(transcripts)
    hourly = hourly_distribution(transcripts)
    top_day = daily.orderBy(F.desc("n"), F.asc("day")).limit(1).select(
        F.col("day").alias("most_active_day"),
        F.col("n").alias("most_active_day_count"),
    )
    top_hour = hourly.orderBy(F.desc("n"), F.asc("hour")).limit(1).select(
        F.col("hour").alias("most_active_hour"),
        F.col("n").alias("most_active_hour_count"),
    )
    summary = daily.agg(
        F.count("*").alias("active_days"),
        F.round(F.sum("n") / F.count("*"), 6).alias("avg_per_active_day"),
        (F.datediff(F.max("day"), F.min("day")) + 1)
        .cast("long")
        .alias("days_in_range"),
    )
    # join on a constant key, NOT crossJoin: on an empty input the
    # limit(1) top frames have zero rows, and a crossJoin would
    # annihilate the always-one-row aggregate summary — the reference
    # always returns a stats struct (nulls for the top fields)
    summary = summary.withColumn("_k", F.lit(1))
    return (
        summary.join(
            F.broadcast(top_day.withColumn("_k", F.lit(1))), "_k", "left"
        )
        .join(F.broadcast(top_hour.withColumn("_k", F.lit(1))), "_k", "left")
        .drop("_k")
    )


def monthly_trend(transcripts: DataFrame) -> DataFrame:
    """GROUP BY yyyy-MM with avg engagement analog = avg turn length
    (query_monthly_trend, stats_analytics.rs:488-518)."""
    return (
        transcripts.groupBy(F.date_format("ts", "yyyy-MM").alias("month"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
        )
        .orderBy("month")
    )


def length_histogram(transcripts: DataFrame) -> DataFrame:
    """CASE-bucketed length distribution with pct (likes histogram
    shape, stats_analytics.rs:317-387; buckets per :674-742)."""
    bucket = (
        F.when(F.length("text") <= 50, "0-50")
        .when(F.length("text") <= 140, "51-140")
        .when(F.length("text") <= 280, "141-280")
        .otherwise("280+")
    )
    total = transcripts.count()
    return (
        transcripts.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .withColumn("pct", F.round(F.col("n") * 100.0 / F.lit(total), 4))
        # numeric sort key: lexicographic label order would interleave
        # the buckets ('141-280' < '51-140' as strings)
        .orderBy(
            F.when(F.col("bucket") == "0-50", 0)
            .when(F.col("bucket") == "51-140", 1)
            .when(F.col("bucket") == "141-280", 2)
            .otherwise(3)
        )
    )


def conversation_summaries(transcripts: DataFrame) -> DataFrame:
    """Per-conversation summary: participant roles (sorted set), turn
    count, time bounds — the DmConversationSummary analog
    (storage.rs:529-548, model.rs:70-77)."""
    return (
        transcripts.groupBy("conv_id")
        .agg(
            F.sort_array(F.collect_set("role")).alias("roles"),
            F.count("*").alias("n_turns"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("conv_id")
    )


def top_tools(transcripts: DataFrame, limit: int = 10) -> DataFrame:
    """Top tools by usage — the top-hashtags analog via explode-free
    groupBy (query_top_hashtags, stats_analytics.rs:746-777: the
    reference scans JSON columns client-side; arrays are native here)."""
    return (
        transcripts.where((F.col("tool").isNotNull()) & (F.col("tool") != ""))
        .groupBy(F.lower(F.col("tool")).alias("tool"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tool"))
        .limit(limit)
    )


def content_ratios(transcripts: DataFrame) -> DataFrame:
    """Conditional-count content ratios (query_content_counts,
    stats_analytics.rs:620-671): markdown / code-block / question /
    low-signal turns."""
    return transcripts.agg(
        F.count("*").alias("n_turns"),
        F.sum(F.when(F.col("text").contains("```"), 1).otherwise(0)).alias(
            "n_code_block"
        ),
        F.sum(
            F.when(
                F.col("text").rlike(r"\[[^\]]*\]\([^)]*\)|\*\*"), 1
            ).otherwise(0)
        ).alias("n_markdown"),
        F.sum(F.when(F.col("text").contains("?"), 1).otherwise(0)).alias(
            "n_question"
        ),
        F.sum(F.when(F.length("text") < 8, 1).otherwise(0)).alias("n_short"),
    )


def median_turn_length(transcripts: DataFrame) -> DataFrame:
    """Exact median of turn lengths (median engagement analog,
    stats_analytics.rs:464-476)."""
    return transcripts.agg(
        F.round(F.expr("percentile(length(text), 0.5)"), 4).alias("p50_chars"),
        F.round(F.expr("percentile(length(text), 0.9)"), 4).alias("p90_chars"),
    )


def turns_per_conversation_histogram(transcripts: DataFrame) -> DataFrame:
    """Distribution of conversation lengths (bucketed)."""
    per_conv = transcripts.groupBy("conv_id").agg(F.count("*").alias("n"))
    bucket = (
        F.when(F.col("n") <= 5, "01-05")
        .when(F.col("n") <= 10, "06-10")
        .when(F.col("n") <= 20, "11-20")
        .when(F.col("n") <= 40, "21-40")
        .otherwise("40+")
    )
    return (
        per_conv.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Terminal rendering (sparkline, stats_analytics.rs:916-1001; driver-
# side pure python over the tiny collected aggregates — never run on
# executors)
# ---------------------------------------------------------------------------

_BLOCKS = "▁▂▃▄▅▆▇█"


def sparkline(values, width: int = 50) -> str:
    """Unicode sparkline (stats_analytics.rs:932-963): if there are
    more values than ``width``, bucket by ceil-div-sized chunks and
    take the integer average per bucket; scale against the bucketed
    max onto the 8 block glyphs; an all-zero series renders the floor
    glyph; empty input or width 0 renders ''."""
    vals = [int(v) for v in values]
    if not vals or width <= 0:
        return ""
    if len(vals) > width:
        bs = -(-len(vals) // width)  # ceil div
        vals = [
            sum(chunk) // len(chunk)
            for chunk in (vals[i : i + bs] for i in range(0, len(vals), bs))
        ]
    mx = max(vals)
    if mx == 0:
        return _BLOCKS[0] * min(len(vals), width)
    return "".join(_BLOCKS[int(v / mx * 7)] for v in vals[:width])


def sparkline_from_daily(daily: DataFrame, width: int = 50) -> str:
    """Activity sparkline over the ``daily_counts`` frame
    (sparkline_from_daily, stats_analytics.rs:967-970). Missing days
    are filled with 0 so gaps look like gaps, matching the reference's
    contiguous daily_counts construction (stats_analytics.rs:121-148);
    the collect is bounded by the corpus's day span."""
    import datetime as _dt

    rows = daily.orderBy("day").collect()
    if not rows:
        return ""
    by_day = {r["day"]: int(r["n"]) for r in rows}
    d0, d1 = rows[0]["day"], rows[-1]["day"]
    series = [
        by_day.get(d0 + _dt.timedelta(days=i), 0)
        for i in range((d1 - d0).days + 1)
    ]
    return sparkline(series, width)


def format_hourly_sparkline(hourly: DataFrame) -> str:
    """24-hour sparkline (format_hourly_sparkline,
    stats_analytics.rs:999-1001); absent hours are 0."""
    by_hour = {int(r["hour"]): int(r["n"]) for r in hourly.collect()}
    return sparkline([by_hour.get(h, 0) for h in range(24)], 24)


def format_dow_distribution(dow: DataFrame) -> str:
    """Day-of-week mini bar chart, Sun=0 (format_dow_distribution,
    stats_analytics.rs:979-995): bar length = count/max * 10 full
    blocks, one 'Day: bar' line per weekday."""
    by_dow = {int(r["dow"]): int(r["n"]) for r in dow.collect()}
    counts = [by_dow.get(d, 0) for d in range(7)]
    mx = max(counts) if counts else 0
    days = ["Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat"]
    return "\n".join(
        f"{day}: " + "█" * (int(c / mx * 10) if mx else 0)
        for day, c in zip(days, counts)
    )
