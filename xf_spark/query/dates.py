"""Natural-language date parsing for --since/--until filters.

Driver-side pure-Python port of the useful subset of the reference's
date_parser.rs grammar (846 lines; SURVEY.md §2.5):

- strict ISO: YYYY-MM-DD (start- or end-of-day by ``end`` flag),
  full ISO datetimes;
- YYYY-MM and "<month> <year>";
- quarters: "q1 2024" .. "q4 2024" (date_parser.rs:406-442);
- seasons: "spring/summer/fall/autumn/winter 2023" — winter spans the
  year boundary: Dec 1 year -> Feb end year+1 (date_parser.rs:444-478);
- relative: today, yesterday, weekend (most recent Sat-Sun),
  weekday/weekdays (this week's Mon..min(today, Fri)), "this
  month/year", "last/past week/month/year", "last/past N
  days/weeks/months/years", "N days/... ago"
  (date_parser.rs:199-228,320-337);
- chrono-english-style free-form fallback (the reference delegates to
  the chrono-english crate, Dialect::Us, date_parser.rs:130-136; this
  is the useful subset with the same orientation): bare/next weekday
  ("tuesday", "next tuesday") = next occurrence strictly after today;
  "last tuesday" = most recent strictly before today; "this tuesday" =
  that weekday of the current Mon-based week; "next week/month/year";
  bare month name = that month of the current year; "june 3",
  "june 3, 2024", "3 june", "3 june 2024" day-month forms; ordinal
  days ("june 3rd", "the 3rd of june", "3rd of june 2024"); articles
  ("a week ago", "a fortnight ago") and fortnight units; "beginning/
  start/end of <expr>" = the first/last day of <expr>'s range;
  "now" / "tomorrow" / "this|last weekend"; future offsets ("in 2
  weeks", "2 weeks from now", "3 days hence"); US slash dates
  ("6/15/2024", "6/15/24" — Dialect::Us month/day order, 2-digit
  years pivot at 70); time-of-day forms ("8pm", "16:30", "june 3 at
  4pm", "friday 8pm", noon/midnight) and sub-day offsets ("2 hours
  ago", "in 30 minutes") as POINTs, below. Still outside the subset
  (errors loudly): colloquialisms like "teatime".

Returns naive UTC datetimes (the engine pins session TZ = UTC).
``now`` is injectable for deterministic tests.

Time-of-day (round 5): the reference treats any expression carrying
an explicit time as a POINT, not a day range (date_parser.rs:141-147
``has_explicit_time`` -> ``ParsedDate::Point``; chrono-english parses
the time itself). Supported here with the same point semantics:
"<date-expr> [at] <time>" ("june 3 at 4pm", "friday 8pm", "yesterday
at noon"), bare "<time>" = today at that time ("8pm", "16:30"),
12-hour am/pm and 24-hour colon forms plus noon/midnight, and
sub-day relative offsets ("2 hours ago", "in 30 minutes", "an hour
ago") anchored at ``now``.
"""

from __future__ import annotations

import calendar
import datetime as dt
import re

MONTHS = {m.lower(): i for i, m in enumerate(calendar.month_name) if m}
MONTHS.update({m.lower(): i for i, m in enumerate(calendar.month_abbr) if m})
WEEKDAYS = {d.lower(): i for i, d in enumerate(calendar.day_name)}
WEEKDAYS.update({d.lower(): i for i, d in enumerate(calendar.day_abbr)})

_UNITS = {"day": 1, "week": 7, "fortnight": 14}

# explicit time-of-day: requires am/pm, a colon, or noon/midnight —
# the same signal date_parser.rs:175-197 (has_explicit_time) keys on,
# so a bare day number ("june 3") can never be read as a time
_TIME_SRC = (
    r"(?:(?P<h12>\d{1,2})(?::(?P<m12>\d{2})(?::(?P<s12>\d{2}))?)?"
    r"\s*(?P<ap>am|pm)"
    r"|(?P<h24>\d{1,2}):(?P<m24>\d{2})(?::(?P<s24>\d{2}))?"
    r"|(?P<word>noon|midnight))"
)
_SUBDAY = {"hour": 3600, "minute": 60, "min": 60, "second": 1, "sec": 1}


def _time_of_day(m: re.Match) -> dt.time:
    """Validated time from a ``_TIME_SRC`` match (12h: 1-12 + am/pm
    with 12am=00:00 and 12pm=12:00; 24h: 0-23:0-59)."""
    if m["word"]:
        return dt.time(12, 0) if m["word"] == "noon" else dt.time(0, 0)
    if m["ap"]:
        h = int(m["h12"])
        if not 1 <= h <= 12:
            raise ValueError(f"invalid 12-hour time: {m.group(0)!r}")
        h = h % 12 + (12 if m["ap"] == "pm" else 0)
        mi, sec = int(m["m12"] or 0), int(m["s12"] or 0)
    else:
        h, mi, sec = int(m["h24"]), int(m["m24"]), int(m["s24"] or 0)
    if h > 23 or mi > 59 or sec > 59:
        raise ValueError(f"invalid time of day: {m.group(0)!r}")
    return dt.time(h, mi, sec)


def _offset_date(today: dt.date, n: int, unit: str) -> dt.date:
    """``today`` minus ``n`` day/week/month/year units (``n`` may be
    negative for future offsets — "in 2 months"), day-of-month clamped
    to the target month's length (so '1 year ago' on a leap day or
    '1 month ago' on the 31st never raises)."""
    if unit in _UNITS:
        return today - dt.timedelta(days=n * _UNITS[unit])
    if unit == "month":
        y, mth = today.year, today.month - n
        while mth <= 0:
            mth += 12
            y -= 1
        while mth > 12:
            mth -= 12
            y += 1
    else:  # year
        y, mth = today.year - n, today.month
    return dt.date(y, mth, min(today.day, calendar.monthrange(y, mth)[1]))


def _start_of_day(d: dt.date) -> dt.datetime:
    return dt.datetime(d.year, d.month, d.day)


def _end_of_day(d: dt.date) -> dt.datetime:
    return dt.datetime(d.year, d.month, d.day, 23, 59, 59, 999999)


def _month_range(year: int, month: int) -> tuple[dt.datetime, dt.datetime]:
    last = calendar.monthrange(year, month)[1]
    return _start_of_day(dt.date(year, month, 1)), _end_of_day(
        dt.date(year, month, last)
    )


def parse_date_flexible(
    text: str, end: bool = False, now: dt.datetime | None = None
) -> dt.datetime:
    """Parse one date expression -> datetime. ``end=True`` returns the
    end of the expression's range (for --until), else the start."""
    lo, hi = parse_date_range(text, now=now)
    return hi if end else lo


def parse_date_range(
    text: str, now: dt.datetime | None = None
) -> tuple[dt.datetime, dt.datetime]:
    """Parse an expression into its (start, end) datetime range."""
    # naive-UTC "now" (utcnow() is deprecated since 3.12; this spelling
    # keeps the pinned naive-UTC semantics)
    now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    s = (text or "").strip().lower()
    if not s:
        raise ValueError("empty date expression")

    # ISO / RFC3339 datetime: accept Z suffix, numeric offsets and
    # fractional seconds (the reference's chrono parser does; machine-
    # generated timestamps — e.g. copied from the indexed ts column —
    # are the most common interchange form). Offset-bearing inputs are
    # converted to UTC and compared naively, matching the stored ts.
    if re.fullmatch(r"\d{4}-\d{2}-\d{2}[t ].+", s):
        try:
            t = dt.datetime.fromisoformat(s.upper().replace("Z", "+00:00"))
        except ValueError:
            pass
        else:
            if t.tzinfo is not None:
                t = t.astimezone(dt.timezone.utc).replace(tzinfo=None)
            return t, t
    # explicit time-of-day -> a POINT (date_parser.rs:141-147: any
    # expression with has_explicit_time parses to ParsedDate::Point).
    # The optional date part is resolved through the full grammar and
    # anchors on the FIRST day of its range ("friday 8pm" = that
    # friday; "march 9am" = March 1); no date part = today.
    tm = re.fullmatch(rf"(?:(.+?)\s+)??(?:at\s+)?{_TIME_SRC}", s)
    if tm and (tm["ap"] or tm["h24"] or tm["word"]):
        tod = _time_of_day(tm)
        if tm[1]:
            anchor = parse_date_range(tm[1], now=now)[0].date()
        else:
            anchor = now.date()
        point = dt.datetime.combine(anchor, tod)
        return point, point

    # sub-day relative offsets -> POINTs anchored at ``now``
    s_subday = re.sub(r"\ban?\s+(hour|minute|min|second|sec)\b", r"1 \1", s)
    m = re.fullmatch(
        r"(\d+)\s+(hour|minute|min|second|sec)s?\s+ago", s_subday
    )
    if m:
        point = now - dt.timedelta(seconds=int(m[1]) * _SUBDAY[m[2]])
        return point, point
    m = re.fullmatch(
        r"in\s+(\d+)\s+(hour|minute|min|second|sec)s?", s_subday
    ) or re.fullmatch(
        r"(\d+)\s+(hour|minute|min|second|sec)s?\s+"
        r"(?:from\s+now|hence)",
        s_subday,
    )
    if m:
        point = now + dt.timedelta(seconds=int(m[1]) * _SUBDAY[m[2]])
        return point, point

    m = re.fullmatch(r"(\d{4})-(\d{2})-(\d{2})", s)
    if m:
        d = dt.date(int(m[1]), int(m[2]), int(m[3]))
        return _start_of_day(d), _end_of_day(d)
    # US slash dates (chrono-english Dialect::Us: month/day/year;
    # 2-digit years pivot at 70 like chrono's %y)
    m = re.fullmatch(r"(\d{1,2})/(\d{1,2})/(\d{2}|\d{4})", s)
    if m:
        y = int(m[3])
        if y < 100:
            y += 1900 if y >= 70 else 2000
        d = dt.date(y, int(m[1]), int(m[2]))
        return _start_of_day(d), _end_of_day(d)
    m = re.fullmatch(r"(\d{4})-(\d{2})", s)
    if m:
        return _month_range(int(m[1]), int(m[2]))
    m = re.fullmatch(r"(\d{4})", s)
    if m:
        y = int(m[1])
        return _start_of_day(dt.date(y, 1, 1)), _end_of_day(dt.date(y, 12, 31))

    # quarters: q1 2024 / 2024 q1 (date_parser.rs:406-442)
    m = re.fullmatch(r"q([1-4])\s+(\d{4})", s) or re.fullmatch(
        r"(\d{4})\s+q([1-4])", s
    )
    if m:
        a, b = m.groups()
        q, y = (int(a), int(b)) if len(a) == 1 else (int(b), int(a))
        sm = 3 * (q - 1) + 1
        lo, _ = _month_range(y, sm)
        _, hi = _month_range(y, sm + 2)
        return lo, hi

    # seasons (date_parser.rs:444-478); winter spans the year boundary
    m = re.fullmatch(r"(spring|summer|fall|autumn|winter)\s+(\d{4})", s)
    if m:
        season, y = m[1], int(m[2])
        if season == "spring":
            return _month_range(y, 3)[0], _month_range(y, 5)[1]
        if season == "summer":
            return _month_range(y, 6)[0], _month_range(y, 8)[1]
        if season in ("fall", "autumn"):
            return _month_range(y, 9)[0], _month_range(y, 11)[1]
        return _month_range(y, 12)[0], _month_range(y + 1, 2)[1]

    # month year: "january 2024" / "jan 2024"
    m = re.fullmatch(r"([a-z]+)\s+(\d{4})", s)
    if m and m[1] in MONTHS:
        return _month_range(int(m[2]), MONTHS[m[1]])

    # relative (date_parser.rs:199-228); "past X" == "last X";
    # chrono-english articles: "a/an <unit> ago" == "1 <unit> ago"
    s = re.sub(r"^past\b", "last", s)
    s = re.sub(r"\ban?\s+(day|week|fortnight|month|year)\b", r"1 \1", s)
    today = now.date()

    # beginning/start/end of <expr> (pinned semantics: the first/last
    # DAY of whatever range <expr> parses to — "beginning of june" =
    # June 1, "end of last year" = Dec 31 of last year)
    m = re.fullmatch(r"(beginning|start|end)\s+of\s+(.+)", s)
    if m:
        lo, hi = parse_date_range(m[2], now=now)
        d = lo.date() if m[1] in ("beginning", "start") else hi.date()
        return _start_of_day(d), _end_of_day(d)
    if s == "now":
        # chrono-english "now": the instant itself (not a day range)
        return now, now
    if s == "today":
        return _start_of_day(today), _end_of_day(today)
    if s == "yesterday":
        d = today - dt.timedelta(days=1)
        return _start_of_day(d), _end_of_day(d)
    if s == "tomorrow":
        d = today + dt.timedelta(days=1)
        return _start_of_day(d), _end_of_day(d)
    if s == "last weekend":
        # the Sat-Sun pair before the most recent one
        saturday = today - dt.timedelta(days=(today.weekday() + 2) % 7 + 7)
        return _start_of_day(saturday), _end_of_day(
            saturday + dt.timedelta(days=1)
        )
    if s in ("weekend", "this weekend"):
        # most recent Sat-Sun on or before today (date_parser.rs:320-326)
        saturday = today - dt.timedelta(days=(today.weekday() + 2) % 7)
        return _start_of_day(saturday), _end_of_day(
            saturday + dt.timedelta(days=1)
        )
    if s in ("weekday", "weekdays"):
        # this week's Mon..min(today, Fri) (date_parser.rs:328-337)
        monday = today - dt.timedelta(days=today.weekday())
        end = today if today.weekday() <= 4 else monday + dt.timedelta(days=4)
        return _start_of_day(monday), _end_of_day(end)
    if s == "this week":
        # Mon..Sun of the current Mon-based week (symmetric with
        # "last week" / "next week")
        monday = today - dt.timedelta(days=today.weekday())
        return _start_of_day(monday), _end_of_day(monday + dt.timedelta(days=6))
    if s == "this month":
        return _month_range(today.year, today.month)
    if s == "this year":
        return _start_of_day(dt.date(today.year, 1, 1)), _end_of_day(
            dt.date(today.year, 12, 31)
        )
    if s == "last week":
        start = today - dt.timedelta(days=today.weekday() + 7)
        return _start_of_day(start), _end_of_day(start + dt.timedelta(days=6))
    if s == "last month":
        y, mth = (today.year, today.month - 1) if today.month > 1 else (
            today.year - 1,
            12,
        )
        return _month_range(y, mth)
    if s == "last year":
        return _start_of_day(dt.date(today.year - 1, 1, 1)), _end_of_day(
            dt.date(today.year - 1, 12, 31)
        )
    m = re.fullmatch(r"last\s+(\d+)\s+(day|week|fortnight|month|year)s?", s)
    if m:
        start = _offset_date(today, int(m[1]), m[2])
        return _start_of_day(start), _end_of_day(today)
    m = re.fullmatch(r"(\d+)\s+(day|week|fortnight|month|year)s?\s+ago", s)
    if m:
        d = _offset_date(today, int(m[1]), m[2])
        return _start_of_day(d), _end_of_day(d)
    # future offsets (chrono-english: "in 2 weeks", "2 weeks from now",
    # "3 days hence") — useful as an --until bound
    m = (
        re.fullmatch(r"in\s+(\d+)\s+(day|week|fortnight|month|year)s?", s)
        or re.fullmatch(
            r"(\d+)\s+(day|week|fortnight|month|year)s?\s+"
            r"(?:from\s+(?:now|today)|hence)",
            s,
        )
    )
    if m:
        d = _offset_date(today, -int(m[1]), m[2])
        return _start_of_day(d), _end_of_day(d)

    # --- chrono-english-style free-form fallback (date_parser.rs:130-
    # 136 delegates to the chrono-english crate; subset re-expressed
    # with the same next/last orientation, Dialect::Us month-day order
    # preferred but day-month accepted) -------------------------------

    # [last|next|this] <weekday>
    m = re.fullmatch(r"(?:(last|next|this)\s+)?([a-z]+)", s)
    if m and m[2] in WEEKDAYS:
        wd = WEEKDAYS[m[2]]
        qual = m[1]
        if qual == "last":
            # most recent strictly before today
            d = today - dt.timedelta(days=(today.weekday() - wd) % 7 or 7)
        elif qual == "this":
            # that weekday of the current Mon-based week
            d = today + dt.timedelta(days=wd - today.weekday())
        else:  # bare or "next": next occurrence strictly after today
            d = today + dt.timedelta(days=(wd - today.weekday()) % 7 or 7)
        return _start_of_day(d), _end_of_day(d)

    if s == "next week":
        start = today + dt.timedelta(days=7 - today.weekday())
        return _start_of_day(start), _end_of_day(start + dt.timedelta(days=6))
    if s == "next month":
        y, mth = (today.year, today.month + 1) if today.month < 12 else (
            today.year + 1,
            1,
        )
        return _month_range(y, mth)
    if s == "next year":
        return _start_of_day(dt.date(today.year + 1, 1, 1)), _end_of_day(
            dt.date(today.year + 1, 12, 31)
        )

    # bare month name -> that month of the current year
    if s in MONTHS:
        return _month_range(today.year, MONTHS[s])

    # day-month forms incl. the chrono-english ordinal long tail:
    # "june 3" / "june 3rd" / "june 3, 2024" / "3 june" / "3rd june" /
    # "the 3rd of june" / "3rd of june 2024"
    _ORD = r"(?:st|nd|rd|th)?"
    m = re.fullmatch(rf"([a-z]+)\s+(\d{{1,2}}){_ORD}(?:,?\s+(\d{{4}}))?", s)
    if m and m[1] in MONTHS and 1 <= int(m[2]) <= 31:
        y = int(m[3]) if m[3] else today.year
        d = dt.date(y, MONTHS[m[1]], int(m[2]))
        return _start_of_day(d), _end_of_day(d)
    m = re.fullmatch(
        rf"(?:the\s+)?(\d{{1,2}}){_ORD}\s+(?:of\s+)?([a-z]+)(?:,?\s+(\d{{4}}))?",
        s,
    )
    if m and m[2] in MONTHS and 1 <= int(m[1]) <= 31:
        y = int(m[3]) if m[3] else today.year
        d = dt.date(y, MONTHS[m[2]], int(m[1]))
        return _start_of_day(d), _end_of_day(d)

    raise ValueError(f"unrecognized date expression: {text!r}")
