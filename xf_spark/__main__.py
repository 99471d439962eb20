"""xf_spark CLI — the `xf` command surface over spark-submit.

    spark-submit --py-files xf_spark.zip -m ... OR
    python -m xf_spark index --input transcripts.parquet --out /idx
    python -m xf_spark search "machine learning" --index /idx --mode lexical
    python -m xf_spark stats --index /idx --detailed
    python -m xf_spark export --index /idx --query rust --format csv --out /tmp/r

Mirrors the reference CLI (cli.rs): index / search (modes lexical|
semantic|hybrid, --types -> --roles, --since/--until natural-language
dates, --limit/--offset, --context, five output formats) / stats /
export.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _spark(args):
    from xf_spark import config as _config
    from xf_spark.session import get_spark

    cores = args.cores
    if cores is None:
        # indexing.threads config (0 = auto, i.e. all cores)
        t = _config.load()["indexing.threads"]
        if t:
            cores = t
    return get_spark("xf_spark_cli", cores=cores)


def _resolve_index(args) -> str:
    """--index flag, else the config paths.index default (the
    get_index_path(cli) resolution order)."""
    if getattr(args, "index", None):
        return args.index
    from xf_spark import config as _config

    stored = _config.load()["paths.index"]
    if stored:
        return stored
    raise SystemExit(
        "this command requires --index (or `config --set paths.index=...`)"
    )


def cmd_index(args) -> int:
    from xf_spark.engine import XfIndex
    from xf_spark.sources import iceberg as ice
    from xf_spark.sources.tables import load_transcript_table

    spark = _spark(args)
    kw = dict(
        with_embeddings=not args.no_embeddings,
        n_shards=args.shards,
        slices=args.slices,
    )
    if ice.is_iceberg_table(args.input):
        # record the indexed snapshot so `sync` can later append only
        # the files new commits added (manifest-diff maintenance)
        ix = XfIndex.build_iceberg(spark, args.input, args.out, **kw)
    else:
        ix = XfIndex.build(
            load_transcript_table(spark, args.input), args.out, **kw
        )
    n = ix.docs.count()
    print(f"indexed {n} turns -> {args.out}")
    return 0


def cmd_sync(args) -> int:
    from xf_spark.engine import XfIndex

    spark = _spark(args)
    path = _resolve_index(args)
    ix = XfIndex.open(spark, path)
    n = ix.sync_iceberg(args.table, dedup=not args.no_dedup)
    print(f"synced {n} turns from {args.table} -> {path}")
    return 0


def cmd_table(args) -> int:
    from xf_spark.sources import iceberg as ice

    if args.table_op == "snapshots":
        meta = ice.load_metadata(args.table)
        cur = meta.get("current-snapshot-id")
        for s in sorted(
            meta.get("snapshots", []), key=lambda s: s["sequence-number"]
        ):
            mark = "*" if s["snapshot-id"] == cur else " "
            print(
                f"{mark} {s['snapshot-id']}  seq={s['sequence-number']}  "
                f"{s['summary'].get('operation', '?')}"
            )
        return 0
    if args.table_op == "expire":
        expired = ice.expire_snapshots(args.table, keep_last=args.keep)
        print(f"expired {len(expired)} snapshot(s): {expired}")
        return 0
    if args.table_op == "orphans":
        removed = ice.remove_orphan_files(args.table, dry_run=args.dry_run)
        verb = "would remove" if args.dry_run else "removed"
        for d in removed:
            print(d)
        print(f"{verb} {len(removed)} orphan dir(s)")
        return 0
    if args.table_op == "doctor":
        report = ice.check_table(args.table)
        print(json.dumps(report, indent=2))
        return 0 if report["ok"] else 1
    raise ValueError(f"unknown table op {args.table_op}")


def cmd_repl(args) -> int:
    """Interactive session (repl.rs analog): plain text searches; slash
    -free commands: more / show N / refine <terms> / stats /
    set <mode|limit|roles> <v> / export <fmt> / help / quit."""
    import sys as _sys

    from xf_spark.engine import XfIndex

    spark = _spark(args)
    # interactive serving: pin vectors + docs under explicit budgets so
    # warm queries run zero Spark jobs (over budget -> distributed
    # paths serve identically)
    ix = XfIndex.open(spark, _resolve_index(args)).cache(
        pin_vectors_mb=args.pin_mb,
        pin_docs_mb=args.pin_mb,
        warm_top_terms=256,
    )
    from xf_spark import config as _config

    cfg = _config.load()
    state = {"mode": "lexical", "limit": cfg["search.default_limit"],
             "roles": None, "query": None, "offset": 0, "rows": [],
             "fuzzy": bool(cfg["search.fuzzy"])}
    cols = ["conv_id", "turn_idx", "role", "text", "score"]

    def run_search():
        kw = {}
        if state["roles"]:
            kw["roles"] = state["roles"]
        df = ix.search(state["query"], mode=state["mode"],
                       limit=state["limit"], offset=state["offset"],
                       fuzzy=state["fuzzy"], **kw)
        state["rows"] = df.select(*cols).collect()
        _format_rows(state["rows"], "text", cols)
        if not state["rows"]:
            sugg = ix.suggest(state["query"])
            print(f"(no results — did you mean: {sugg})"
                  if sugg else "(no results)")

    print("xf_spark repl — type a query, 'help', or 'quit'")
    for line in _repl_lines(_sys):
        line = line.strip()
        if not line:
            continue
        word, _, rest = line.partition(" ")
        w = word.lower()
        if w in ("quit", "exit", "q"):
            break
        try:
            _repl_dispatch(w, rest, line, state, cols, ix, run_search)
        except Exception as exc:  # noqa: BLE001 — session must survive
            # bad input / engine errors print and continue (repl.rs
            # keeps the session alive on per-command errors)
            print(f"error: {exc}")
    return 0


_REPL_VERBS = (
    "more", "show", "similar", "refine", "facet", "count", "explain",
    "complete", "stats", "sig", "set", "export", "help", "quit", "exit",
)
_REPL_SET_KEYS = ("mode", "limit", "roles", "fuzzy")


def _repl_lines(_sys):
    """REPL input lines. On a TTY with readline available: rustyline-
    parity line editing (repl.rs:218-231) — tab-completion of verbs,
    `set` keys, and modes, plus persistent history in
    ~/.xf_spark_history. Non-TTY (piped scripts, tests) falls back to
    plain stdin iteration; readline import failures degrade the same
    way."""
    use_rl = False
    if _sys.stdin.isatty():
        try:
            import atexit
            import os as _os
            import readline

            hist = _os.path.expanduser("~/.xf_spark_history")
            try:
                readline.read_history_file(hist)
            except OSError:
                pass
            readline.set_history_length(1000)
            atexit.register(lambda: _try_write_history(readline, hist))

            def completer(text, state_i):
                buf = readline.get_line_buffer()
                head = buf[: readline.get_begidx()].strip().lower()
                if not head:
                    cands = [v for v in _REPL_VERBS if v.startswith(text)]
                elif head == "set":
                    cands = [k for k in _REPL_SET_KEYS if k.startswith(text)]
                elif head == "set mode":
                    cands = [m for m in _REPL_MODES if m.startswith(text)]
                elif head == "export":
                    cands = [f for f in ("json", "csv") if f.startswith(text)]
                else:
                    cands = []
                return cands[state_i] if state_i < len(cands) else None

            readline.set_completer(completer)
            readline.parse_and_bind("tab: complete")
            use_rl = True
        except ImportError:
            use_rl = False
    if use_rl:
        while True:
            try:
                yield input("xf> ")
            except EOFError:
                return
            except KeyboardInterrupt:
                print()
                continue
    else:
        yield from _sys.stdin


def _try_write_history(readline_mod, path: str) -> None:
    try:
        readline_mod.write_history_file(path)
    except OSError:
        pass


_REPL_MODES = ("lexical", "semantic", "hybrid", "bm25", "vector", "rrf")


def _repl_dispatch(w, rest, line, state, cols, ix, run_search) -> None:
    if w in ("help", "h", "?"):
        print("commands: <query> | more | show N | similar N | "
              "refine <terms> | facet <col> [query] | count [query] | "
              "sig [query] | explain [query] | complete <prefix> | "
              "stats | set mode|limit|roles|fuzzy <v> | "
              "export json|csv | quit")
    elif w == "sig":
        # significant terms over the session's current (or given)
        # query — the ES significant_terms analog, lift-ranked
        q = rest.strip() or state["query"] or ""
        if not q:
            print("sig: usage: sig [query] (or run a search first)")
            return
        rows = ix.significant_terms(
            q, limit=10, roles=state["roles"], fuzzy=state["fuzzy"]
        ).collect()
        _format_rows(rows, "text", ["term", "n_match", "df", "lift"])
    elif w == "facet":
        col, _, fq = rest.partition(" ")
        if not col:
            print("facet: usage: facet <col|date:unit> [query]")
            return
        q = fq.strip() or state["query"] or ""
        rows = ix.facet_counts(
            q, facet=col, roles=state["roles"], limit=20,
            fuzzy=state["fuzzy"],  # same match set the session's
            # searches and `count` resolve — aggregates must agree
        ).collect()
        _format_rows(rows, "text", ["value", "n_docs"])
    elif w == "count":
        q = rest.strip() or state["query"] or ""
        print(ix.count_matches(q, roles=state["roles"],
                               fuzzy=state["fuzzy"]))
    elif w == "complete":
        p = rest.strip()
        if not p:
            print("complete: usage: complete <prefix>")
            return
        try:
            rows = ix.complete(p, limit=10).collect()
        except ValueError as exc:
            print(f"complete: {exc}")
            return
        for r in rows:
            print(f"{r['term']}  {r['df']}")
    elif w == "explain":
        q = rest.strip() or state["query"] or ""
        try:
            rows = ix.explain(
                q, limit=state["limit"], roles=state["roles"],
                fuzzy=state["fuzzy"],
            ).collect()
        except ValueError as exc:
            print(f"explain: {exc}")
            return
        cols_e = ["doc_id", "term", "field", "tf", "df", "idf",
                  "contrib", "score"]
        print("  ".join(cols_e))
        _format_rows(rows, "text", cols_e)
    elif w == "similar":
        try:
            r = state["rows"][int(rest)]
        except (ValueError, IndexError):
            print("similar: bad index")
            return
        rows = ix.more_like_this(
            r["conv_id"], r["turn_idx"], limit=state["limit"]
        ).select(*cols).collect()
        state["rows"] = rows
        _format_rows(rows, "text", cols)
        if not rows:
            print("(no results)")
    elif w in ("more", "m"):
        if state["query"] is None:
            print("no active query")
            return
        state["offset"] += state["limit"]
        run_search()
    elif w == "show":
        try:
            r = state["rows"][int(rest)]
        except (ValueError, IndexError):
            print("show: bad index")
            return
        print(f"({r['conv_id']}, {r['turn_idx']}) <{r['role']}> "
              f"score={r['score']:.4f}\n{r['text']}")
    elif w == "refine":
        if state["query"] is None:
            print("no active query")
            return
        state["query"] = f"{state['query']} AND {rest}"
        state["offset"] = 0
        run_search()
    elif w == "stats":
        print(json.dumps({k: str(v) for k, v in ix.stats().items()}))
    elif w == "set":
        name, _, value = rest.partition(" ")
        if name == "mode":
            if value not in _REPL_MODES:
                print(f"set mode: expected one of {'|'.join(_REPL_MODES)}")
                return
            state["mode"] = value
        elif name == "limit":
            try:
                state["limit"] = int(value)
            except ValueError:
                print(f"set limit: expected an integer, got {value!r}")
                return
        elif name == "roles":
            state["roles"] = (
                [r.strip().lower() for r in value.split(",") if r.strip()]
                if value
                else None
            )
        elif name == "fuzzy":
            low = value.strip().lower()
            if low not in ("on", "off", "true", "false", "1", "0"):
                print("set fuzzy: expected on|off")
                return
            state["fuzzy"] = low in ("on", "true", "1")
        else:
            print(f"set: unknown setting {name!r}")
            return
        print(f"{name} = {value}")
    elif w == "export":
        fmt = rest.strip() or "json"
        _format_rows(state["rows"], fmt, cols)
    else:
        state["query"] = line
        state["offset"] = 0
        run_search()


def cmd_append(args) -> int:
    from xf_spark.engine import XfIndex
    from xf_spark.sources.tables import load_transcript_table

    spark = _spark(args)
    path = _resolve_index(args)
    ix = XfIndex.open(spark, path)
    before = ix.segment_index.meta["n_docs"]
    ix = ix.append(
        load_transcript_table(spark, args.input), dedup=not args.no_dedup
    )
    after = ix.segment_index.meta["n_docs"]
    print(f"appended {after - before} turns -> {path} (now {after})")
    return 0


def cmd_compact(args) -> int:
    from xf_spark.engine import XfIndex

    spark = _spark(args)
    path = _resolve_index(args)
    ix = XfIndex.open(spark, path)
    seg_root = os.path.join(path, "segments")
    before = sum(1 for d in os.listdir(seg_root) if d.startswith("slice="))
    drop = None
    if args.drop:
        drop = spark.read.parquet(args.drop)
    n0 = ix.segment_index.meta["n_docs"]
    ix = ix.compact(target_shards=args.shards, drop=drop)
    m = ix.segment_index.meta
    after = sum(1 for d in os.listdir(seg_root) if d.startswith("slice="))
    msg = f"compacted {before} -> {after} slice(s), {m['n_shards']} shards"
    if drop is not None:
        msg += f"; purged {n0 - m['n_docs']} docs (now {m['n_docs']})"
    print(msg)
    return 0


def cmd_import(args) -> int:
    """Extract an X-archive zip and (unless --no-index) build the index
    from every known member (cmd_import, main.rs:516-657)."""
    from xf_spark.sources.archive import import_archive_zip, read_archive_dir

    n_files, n_bytes = import_archive_zip(args.zip, args.out, force=args.force)
    print(f"extracted {n_files} files ({n_bytes} bytes) -> {args.out}")
    if args.no_index:
        return 0
    from xf_spark.engine import XfIndex

    from xf_spark import config as _config

    skip = _config.load()["indexing.skip_types"]
    if skip:
        print(f"skipping member types: {','.join(skip)}")
    spark = _spark(args)
    transcripts = read_archive_dir(spark, args.out, skip=skip)
    idx = args.index_out or os.path.join(args.out, "index")
    ix = XfIndex.build(transcripts, idx, with_embeddings=not args.no_embeddings)
    print(f"indexed {ix.docs.count()} turns -> {idx}")
    return 0


def cmd_curate(args) -> int:
    from xf_spark.ops.curate import curate_corpus
    from xf_spark.sources.tables import load_table, write_table

    spark = _spark(args)
    docs = load_table(spark, args.input)
    kept, report = curate_corpus(
        docs,
        id_col=args.id_col,
        text_col=args.text_col,
        min_quality=args.min_quality,
        min_tokens=args.min_tokens,
        dedup=None if args.dedup == "none" else args.dedup,
        dedup_threshold=args.threshold,
        max_hamming=args.max_hamming,
    )
    write_table(kept, args.out, mode="overwrite")
    r = report.collect()[0]
    print(
        f"curated {r['n_input']} -> {r['n_kept']} rows "
        f"(quality dropped {r['n_quality_dropped']}, "
        f"dups dropped {r['n_dup_dropped']}) -> {args.out}"
    )
    kept.unpersist()
    return 0


def cmd_percolate(args) -> int:
    """`percolate --queries alerts.json --input docs.parquet [--out P]`
    — reverse search (ES percolator): which registered queries match
    each input document. The alerting/routing primitive; one
    shuffle-free pass over the input (see query/percolate.py)."""
    import json as _json

    from pyspark.sql import functions as F

    from xf_spark.query.percolate import percolate

    try:
        with open(args.queries, encoding="utf-8") as f:
            qmap = _json.load(f)
        if not isinstance(qmap, dict) or not qmap:
            raise ValueError("expected a non-empty {qid: query} object")
        pairs = sorted((str(k), str(v)) for k, v in qmap.items())
    except (OSError, ValueError) as e:
        print(f"bad --queries: {e}")
        return 1
    spark = _spark(args)
    docs = spark.read.parquet(args.input)
    if args.id_col not in docs.columns or args.text_col not in docs.columns:
        print(
            f"input lacks --id-col {args.id_col!r} / --text-col "
            f"{args.text_col!r} (has: {', '.join(docs.columns)})"
        )
        return 1
    role_col = args.role_col if args.role_col in docs.columns else None
    try:
        out = percolate(
            docs,
            pairs,
            text_col=args.text_col,
            id_col=args.id_col,
            role_col=role_col,
        )
    except ValueError as e:
        print(str(e))
        return 1
    out = out.orderBy("doc_id", "qid")
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
        counts = {
            r["qid"]: r["n"]
            for r in out.groupBy("qid").agg(F.count("*").alias("n")).collect()
        }
        for qid, _q in pairs:
            print(f"{qid}: {counts.get(qid, 0)} matches")
        print(f"wrote {args.out}")
        return 0
    rows = out.collect()
    _format_rows(rows, args.format, ["doc_id", "qid"])
    return 0


def cmd_similar(args) -> int:
    """Similar turns to an existing one by embedding cosine
    (more-like-this; beyond the reference CLI surface)."""
    from xf_spark.engine import XfIndex

    spark = _spark(args)
    ix = XfIndex.open(spark, _resolve_index(args))
    df = ix.more_like_this(
        args.conv_id,
        args.turn_idx,
        limit=args.limit,
        roles=args.roles.split(",") if args.roles else None,
        since=args.since,
        until=args.until,
    )
    rows = df.collect()
    _format_rows(rows, args.format, df.columns)
    return 0


def cmd_get(args) -> int:
    """Show one turn by (conv_id, turn_idx) — the `tweet <id>` analog
    (cmd_tweet, main.rs:2479-2530). ``--context`` prints every turn of
    the conversation with the requested turn marked (the ``--thread``
    analog, main.rs:2483-2485: a thread is the set of records sharing
    one conversation)."""
    from pyspark.sql import functions as F

    from xf_spark.engine import XfIndex
    from xf_spark.query.results import get_by_id

    spark = _spark(args)
    ix = XfIndex.open(spark, _resolve_index(args))
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    if args.context:
        rows = (
            ix.docs.where(F.col("conv_id") == args.conv_id)
            .select(*cols)
            .orderBy("turn_idx")
            .collect()
        )
        if not rows:
            print(f"not found: conversation {args.conv_id!r}")
            return 1
        if args.format in ("json", "json-pretty", "csv"):
            _format_rows(rows, args.format, cols)
        else:
            for r in rows:
                mark = ">" if r["turn_idx"] == args.turn_idx else " "
                text = (r["text"] or "").replace("\n", " ")
                print(f"{mark} [{r['turn_idx']}] <{r['role']}> {text}")
        return 0
    rows = get_by_id(ix.docs, args.conv_id, args.turn_idx).collect()
    if not rows:
        print(f"not found: ({args.conv_id!r}, {args.turn_idx})")
        return 1
    if args.format in ("json", "json-pretty", "csv"):
        _format_rows(rows, args.format, cols)
    else:
        r = rows[0]
        print("-" * 60)
        print(r["text"] or "")
        print("-" * 60)
        print(
            f"  conv: {r['conv_id']}  turn: {r['turn_idx']}  "
            f"role: {r['role']}  tool: {r['tool'] or '-'}  ts: {r['ts']}"
        )
    return 0


# graph-list target -> (archive member file, read_graph_list kind) —
# the ONE table list/stats/export all derive from
_GRAPH_MEMBERS = {
    "followers": ("follower.js", "follower"),
    "following": ("following.js", "following"),
    "blocks": ("block.js", "block"),
    "mutes": ("mute.js", "mute"),
}


def _graph_reader(kind):
    return lambda m, s, f: m.read_graph_list(s, f, kind)


# list target -> (archive member glob, reader over the matched files)
_ARCHIVE_LISTS = {
    **{
        what: (member, _graph_reader(kind))
        for what, (member, kind) in _GRAPH_MEMBERS.items()
    },
    "account": ("account.js", lambda m, s, f: m.read_account(s, f)),
    "profile": ("profile.js", lambda m, s, f: m.read_profile(s, f)),
    "manifest": ("manifest.js", lambda m, s, f: m.read_manifest(s, f)),
}


def cmd_list(args) -> int:
    """List what's available — the `list <what>` analog (cmd_list,
    main.rs:2532-2620; ListTarget, cli.rs:412-422). Targets map to the
    transcripts model: ``files`` = data files under an extracted
    archive dir; ``conversations`` / ``roles`` / ``tools`` = grouped
    counts over the index's doc store (tweets/likes/dms collapse into
    role/tool values here — one unified table, not three)."""
    from pyspark.sql import functions as F

    if args.what == "files":
        import glob as _glob

        if not args.archive:
            print("list files requires --archive <extracted dir>")
            return 1
        data = os.path.join(args.archive, "data")
        files = sorted(_glob.glob(os.path.join(data, "*.js")))
        if not files:
            print(f"no data files found under {data}")
            return 0
        for f in files:
            print(f"{os.path.getsize(f):>12}  {os.path.basename(f)}")
        return 0

    if args.what in _ARCHIVE_LISTS:
        # social-graph lists + singletons live in the extracted archive
        # (ListTarget::Followers/... main.rs:2671-2735; the reference
        # re-reads its SQLite store — our Spark read IS the store read)
        if not args.archive:
            print(f"list {args.what} requires --archive <extracted dir>")
            return 1
        import glob as _glob

        from xf_spark.sources import archive as _arch

        member, reader = _ARCHIVE_LISTS[args.what]
        files = sorted(_glob.glob(os.path.join(args.archive, "data", member)))
        if not files:
            print(f"no {member} under {args.archive}/data")
            return 0
        spark = _spark(args)
        df = reader(_arch, spark, files)
        if "account_id" in df.columns and args.what in (
            "followers", "following", "blocks", "mutes"
        ):
            df = df.orderBy("account_id").limit(args.limit)
        rows = df.collect()
        cols = df.columns
        if args.format in ("json", "json-pretty", "csv"):
            _format_rows(rows, args.format, cols)
        else:
            print("  ".join(cols))
            for r in rows:
                print("  ".join(str(r[c]) for c in cols))
        return 0

    from xf_spark.engine import XfIndex

    spark = _spark(args)
    ix = XfIndex.open(spark, _resolve_index(args))
    if args.what == "conversations":
        df = (
            ix.docs.groupBy("conv_id")
            .agg(
                F.count("*").alias("n_turns"),
                F.min("ts").alias("started"),
                F.max("ts").alias("ended"),
            )
            .orderBy(F.desc("n_turns"), "conv_id")
            .limit(args.limit)
        )
    else:  # roles | tools
        col = "role" if args.what == "roles" else "tool"
        df = (
            ix.docs.groupBy(F.coalesce(F.col(col), F.lit("-")).alias(col))
            .agg(F.count("*").alias("n_turns"))
            .orderBy(F.desc("n_turns"), col)
            .limit(args.limit)
        )
    rows = df.collect()
    cols = df.columns
    if args.format in ("json", "json-pretty", "csv"):
        _format_rows(rows, args.format, cols)
    else:
        print("  ".join(cols))
        for r in rows:
            print("  ".join(str(r[c]) for c in cols))
    return 0


def _json_val(v):
    # native JSON types survive (numbers, bool, None); only
    # non-JSON-serializable values (timestamps) stringify
    return v if v is None or isinstance(v, (int, float, str, bool)) else str(v)


def _format_rows(rows, fmt: str, columns: list[str]):
    # context-view rows (every turn of matched conversations) carry no
    # score column — formatters must not assume one
    has_score = "score" in columns

    def _score(r) -> str:
        return f"{r['score']:.4f}" if has_score else "-"

    if fmt == "json":
        print(json.dumps([{c: _json_val(r[c]) for c in columns} for r in rows]))
    elif fmt == "json-pretty":
        print(
            json.dumps(
                [{c: _json_val(r[c]) for c in columns} for r in rows], indent=2
            )
        )
    elif fmt == "csv":
        import csv as _csv
        import sys as _sys

        wr = _csv.writer(_sys.stdout)  # proper quoting: embedded
        wr.writerow(columns)           # newlines/commas/quotes in text
        for r in rows:
            wr.writerow(["" if r[c] is None else str(r[c]) for c in columns])
    elif fmt == "compact":
        for r in rows:
            print(f"{r['conv_id']}/{r['turn_idx']} {_score(r)}")
    else:  # text
        if "text" not in columns:
            # tabular rows without a text column (facet counts,
            # collapse hits without hydration): plain aligned values
            for r in rows:
                print("  ".join(str(r[c]) for c in columns))
            return
        for r in rows:
            text = (r["text"] or "").replace("\n", " ")
            snippet = r["snippet"] if "snippet" in columns else text[:100]
            print(
                f"[{_score(r)}] ({r['conv_id']}, {r['turn_idx']}) "
                f"<{r['role']}> {snippet}"
            )


def cmd_search(args) -> int:
    from xf_spark import config as _config
    from xf_spark.engine import XfIndex

    cfg = _config.load()
    # config-file defaults for everything the flag didn't pin
    # (SearchConfig/OutputConfig, config.rs:66-110)
    index = args.index or cfg["paths.index"]
    if not index:
        print("search requires --index (or `config --set paths.index=...`)")
        return 1
    limit = args.limit if args.limit is not None else cfg["search.default_limit"]
    fuzzy = args.fuzzy if args.fuzzy is not None else cfg["search.fuzzy"]
    fmt = args.format or cfg["output.format"]
    synonyms = None
    raw_syn = getattr(args, "synonyms", None)
    if raw_syn:
        import json as _json

        try:
            if raw_syn.startswith("@"):
                with open(raw_syn[1:], encoding="utf-8") as f:
                    synonyms = _json.load(f)
            else:
                synonyms = _json.loads(raw_syn)
            if not isinstance(synonyms, dict) or not all(
                isinstance(v, list) for v in synonyms.values()
            ):
                raise ValueError("expected {term: [synonym, ...]}")
        except (OSError, ValueError) as e:
            print(f"bad --synonyms: {e}")
            return 1
    lex_only = (
        synonyms
        or getattr(args, "min_should_match", 1) > 1
        or getattr(args, "rescore", None)
        or getattr(args, "demote", None)
        or getattr(args, "half_life", None) is not None
    )
    if lex_only and args.mode not in ("lexical", "bm25"):
        print(
            "--synonyms / --min-should-match / --rescore / --demote / "
            "--half-life shape the lexical ranking — add `--mode lexical`"
        )
        return 1
    rankers = sum(
        1
        for v in (
            getattr(args, "rescore", None),
            getattr(args, "demote", None),
        )
        if v
    ) + (1 if getattr(args, "half_life", None) is not None else 0)
    if rankers > 1:
        print("--rescore / --demote / --half-life are mutually exclusive")
        return 1
    if getattr(args, "half_life", None) is not None and args.half_life <= 0:
        print("--half-life must be a positive number of days")
        return 1
    spark = _spark(args)
    ix = XfIndex.open(spark, index)
    roles = args.roles.split(",") if args.roles else None
    if getattr(args, "count", False):
        n = ix.count_matches(
            args.query,
            roles=roles,
            since=args.since,
            until=args.until,
            fuzzy=fuzzy,
        )
        print(n)
        return 0
    if getattr(args, "top_hits", None) and not getattr(args, "facet", None):
        print("--top-hits needs --facet (which buckets to rank inside)")
        return 1
    if getattr(args, "facet", None):
        # facet aggregation replaces the hit list: (value, n_docs)
        # counts over the FULL match set (mode is lexical-only here);
        # --top-hits K adds each bucket's top-K hits (ES top_hits)
        if getattr(args, "top_hits", None):
            df = ix.facet_top_hits(
                args.query,
                facet=args.facet,
                k=args.top_hits,
                limit=limit,
                roles=roles,
                since=args.since,
                until=args.until,
                fuzzy=fuzzy,
            )
        else:
            df = ix.facet_counts(
                args.query,
                facet=args.facet,
                roles=roles,
                since=args.since,
                until=args.until,
                fuzzy=fuzzy,
                limit=limit,
            )
    elif getattr(args, "significant_terms", False):
        # (term, n_match, df, lift) over the match set replaces the
        # hit list (ES significant_terms)
        df = ix.significant_terms(
            args.query,
            limit=limit,
            roles=roles,
            since=args.since,
            until=args.until,
            fuzzy=fuzzy,
        )
    elif getattr(args, "stats_col", None):
        # one stats row (n/min/max/avg/sum + exact percentiles) of a
        # numeric doc column across the match set (ES stats +
        # percentiles aggregation)
        df = ix.match_stats(
            args.query,
            col=args.stats_col,
            roles=roles,
            since=args.since,
            until=args.until,
            fuzzy=fuzzy,
        )
    elif getattr(args, "explain", False):
        # score breakdown replaces the hit list: one row per
        # (top-k doc, matched term) with the BM25 pieces
        df = ix.explain(
            args.query,
            limit=limit,
            roles=roles,
            since=args.since,
            until=args.until,
            fuzzy=fuzzy,
        )
    elif getattr(args, "collapse", False):
        df = ix.search_collapsed(
            args.query,
            limit=limit,
            roles=roles,
            since=args.since,
            until=args.until,
            fuzzy=fuzzy,
        )
    elif getattr(args, "rescore", None):
        hits = ix.search_rescored(
            args.query,
            args.rescore,
            limit=limit,
            window=args.rescore_window,
            weight=args.rescore_weight,
            roles=roles,
            since=args.since,
            until=args.until,
            fuzzy=fuzzy,
        )
        df, _presorted = ix._hydrate(hits, "relevance")
    elif getattr(args, "demote", None):
        hits = ix.search_demoted(
            args.query,
            args.demote,
            factor=args.demote_factor,
            limit=limit,
            roles=roles,
            since=args.since,
            until=args.until,
            fuzzy=fuzzy,
        )
        df, _presorted = ix._hydrate(hits, "relevance")
    elif getattr(args, "half_life", None) is not None:
        hits = ix.search_decayed(
            args.query,
            half_life_days=args.half_life,
            limit=limit,
            roles=roles,
            since=args.since,
            until=args.until,
            fuzzy=fuzzy,
        )
        df, _presorted = ix._hydrate(hits, "relevance")
    else:
        df = ix.search(
            args.query,
            mode=args.mode,
            limit=limit,
            offset=args.offset,
            roles=roles,
            since=args.since,
            until=args.until,
            sort=args.sort,
            snippets=fmt == "text",
            context=args.context,
            fuzzy=fuzzy,
            synonyms=synonyms,
            min_should_match=getattr(args, "min_should_match", 1),
        )
    rows = df.collect()
    cols = df.columns
    min_score = cfg["search.min_score"]
    if min_score > 0 and "score" in cols:
        rows = [r for r in rows if r["score"] >= min_score]
    if not rows and fmt == "text" and not args.facet:
        # zero-hit UX: spell-check unknown terms against the vocabulary
        sugg = ix.suggest(args.query)
        if sugg:
            print(f"no results — did you mean: {sugg}")
    _format_rows(rows, fmt, cols)
    return 0


def cmd_config(args) -> int:
    """`config --set key=value [--archive P] [--show]` (cmd_config,
    main.rs:2941-2969)."""
    from xf_spark import config as _config

    # read-modify-save: load WITHOUT the transient XF_LIMIT override,
    # or any --set would persist the env value into the stored file
    cfg = _config.load(apply_env=False)
    changed = False
    for raw in args.set or []:
        try:
            _config.set_value(cfg, raw)
        except ValueError as exc:
            print(str(exc))
            return 1
        changed = True
    if args.archive is not None:
        cfg["paths.archive"] = args.archive or None
        changed = True
    if changed:
        path = _config.save(cfg)
        print(f"updated configuration -> {path}")
    if args.show or not changed:
        print(json.dumps(cfg, indent=2, sort_keys=True))
    return 0


def cmd_stats(args) -> int:
    from xf_spark.engine import XfIndex

    spark = _spark(args)
    ix = XfIndex.open(spark, _resolve_index(args))
    out = ix.stats(detailed=args.detailed)
    if args.archive:
        # social-graph counts come off the extracted archive
        # (followers/following/blocks/mutes rows of cmd_stats,
        # main.rs:2129-2146)
        import glob as _glob

        from xf_spark.sources.archive import read_graph_list

        graph = {}
        for what, (member, kind) in _GRAPH_MEMBERS.items():
            files = sorted(
                _glob.glob(os.path.join(args.archive, "data", member))
            )
            graph[what] = (
                read_graph_list(spark, files, kind).count() if files else 0
            )
        out["graph"] = graph
    print(json.dumps(out, default=str, indent=2))
    if getattr(args, "temporal", False):
        # Temporal Patterns block (cmd_stats --temporal,
        # main.rs:2208-2285): activity sparkline + key metrics +
        # hourly sparkline + day-of-week bars
        from xf_spark.analytics import stats as S

        docs = ix.docs
        print()
        print("Temporal Patterns")
        print("─" * 40)
        daily = S.daily_counts(docs)
        print("  Activity:", S.sparkline_from_daily(daily, 50))
        a = S.activity_summary(docs).first()
        print(f"  {'Active days:':<25} {a['active_days']:>10}")
        print(f"  {'Total days in range:':<25} {a['days_in_range']:>10}")
        print(
            f"  {'Avg turns/active day:':<25} "
            f"{float(a['avg_per_active_day'] or 0):>10.1f}"
        )
        if a["most_active_day"] is not None:
            print(
                f"  {'Most active day:':<25} {a['most_active_day']} "
                f"({a['most_active_day_count']})"
            )
        if a["most_active_hour"] is not None:
            print(
                f"  {'Most active hour:':<25} "
                f"{int(a['most_active_hour']):02d}:00 "
                f"({a['most_active_hour_count']})"
            )
        gap = S.longest_gap_days(docs).first()["max_gap_days"]
        if gap and gap > 1:
            print(f"  {'Longest gap:':<25} {gap} days")
        print()
        print("  Hourly distribution (00-23):")
        print("  " + S.format_hourly_sparkline(S.hourly_distribution(docs)))
        print()
        print("  Day of week:")
        for line in S.format_dow_distribution(
            S.dow_distribution(docs)
        ).splitlines():
            print("  " + line)
    return 0


def cmd_completions(args) -> int:
    """Emit a shell-completion script (Commands::Completions,
    main.rs:203-206). Generated from the live argparse tree, so new
    subcommands/flags appear without touching this function."""
    parser = build_parser()
    subs = {}
    for action in parser._subparsers._group_actions:
        for name, sp in action.choices.items():
            opts = []
            positional_choices = []
            for a in sp._actions:
                opts.extend(a.option_strings)
                if not a.option_strings and a.choices:
                    positional_choices.extend(a.choices)
            subs[name] = sorted(set(opts)) + sorted(positional_choices)
    prog = "xf_spark"
    if args.shell == "bash":
        # the subcommand is the first word that names one — NOT
        # COMP_WORDS[1], which may be a global flag like --cores
        lines = [
            f"_{prog}_complete() {{",
            "  local cur cmds cmd w i",
            '  cur="${COMP_WORDS[COMP_CWORD]}"',
            f'  cmds="{" ".join(sorted(subs))}"',
            '  cmd=""',
            "  for ((i=1; i<COMP_CWORD; i++)); do",
            '    w="${COMP_WORDS[i]}"',
            '    case " $cmds " in *" $w "*) cmd="$w"; break;; esac',
            "  done",
            '  if [ -z "$cmd" ]; then',
            '    COMPREPLY=( $(compgen -W "$cmds --cores" -- "$cur") ); return',
            "  fi",
            '  case "$cmd" in',
        ]
        for name, words in sorted(subs.items()):
            lines.append(
                f'    {name}) COMPREPLY=( $(compgen -W "{" ".join(words)}"'
                ' -- "$cur") );;'
            )
        lines += ["  esac", "}", f"complete -F _{prog}_complete {prog}"]
        print("\n".join(lines))
        return 0
    if args.shell == "zsh":
        print(f"#compdef {prog}")
        print("_arguments '1:command:(" + " ".join(sorted(subs)) + ")'")
        return 0
    print(f"unsupported shell: {args.shell}")
    return 1


# doc-type export targets -> conv_id prefix in the unified doc space
# (ExportTarget, cli.rs:426-434; the readers tag each member's rows)
_EXPORT_PREFIXES = {
    "tweets": "tweet_",
    "likes": "like_",
    "dms": "dm_",
    "grok": "grok_",
}


def _export_member(spark, args, what):
    """One export member as a DataFrame, limit applied per member
    (cmd_export, main.rs:2774-2800)."""
    from pyspark.sql import functions as F

    if what in _EXPORT_PREFIXES:
        from xf_spark.engine import XfIndex

        ix = XfIndex.open(spark, _resolve_index(args))
        return (
            ix.docs.where(F.col("conv_id").startswith(_EXPORT_PREFIXES[what]))
            .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
            .orderBy("conv_id", "turn_idx")
            .limit(args.limit)
        )
    # graph lists come straight off the extracted archive
    import glob as _glob

    from xf_spark.sources.archive import read_graph_list

    if not args.archive:
        raise SystemExit(f"export {what} requires --archive <extracted dir>")
    member, kind = _GRAPH_MEMBERS[what]
    files = sorted(_glob.glob(os.path.join(args.archive, "data", member)))
    if not files:
        raise SystemExit(f"no {member} under {args.archive}/data")
    return (
        read_graph_list(spark, files, kind)
        .orderBy("account_id")
        .limit(args.limit)
    )


def cmd_export(args) -> int:
    from pyspark.sql import functions as F

    from xf_spark.query.results import export_results

    spark = _spark(args)
    if args.what == "search":
        from xf_spark.engine import XfIndex

        ix = XfIndex.open(spark, _resolve_index(args))
        df = ix.search(args.query or "", mode="lexical", limit=args.limit)
    elif args.what == "all":
        # combined export: one type-tagged JSON line per record
        # ({"type": t, "data": {...}} — the Jsonl arm of ExportTarget::All,
        # main.rs:2815-2846); csv refused like the reference. Member
        # schemas differ, so each record serializes to its own JSON
        # object and the union is a line column written as text.
        if args.format in ("csv", "parquet"):
            raise SystemExit(
                "export all supports json/jsonl only. Export individual types."
            )
        parts = []
        for what in (*_EXPORT_PREFIXES, *_GRAPH_MEMBERS):
            try:
                m = _export_member(spark, args, what)
            except SystemExit:
                continue  # member needs --index/--archive that wasn't given
            tag = {"tweets": "tweet", "likes": "like", "dms": "dm",
                   "grok": "grok", "followers": "follower",
                   "following": "following", "blocks": "block",
                   "mutes": "mute"}[what]
            parts.append(
                m.select(
                    F.concat(
                        F.lit('{"type":"%s","data":' % tag),
                        F.to_json(F.struct(*m.columns)),
                        F.lit("}"),
                    ).alias("value")
                )
            )
        if not parts:
            raise SystemExit("export all found no members (need --index/--archive)")
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.coalesce(1).write.mode("overwrite").text(args.out)
        print(f"exported -> {args.out}")
        return 0
    else:
        df = _export_member(spark, args, args.what)
    export_results(df, args.out, fmt=args.format)
    print(f"exported -> {args.out}")
    return 0


def cmd_doctor(args) -> int:
    from xf_spark.doctor import format_report, run_doctor

    spark = _spark(args)
    checks = run_doctor(spark, _resolve_index(args), repair=args.repair)
    print(format_report(checks))
    return 0 if all(c.ok for c in checks) else 1


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="xf_spark")
    p.add_argument("--cores", default=None, help="local[N] cores (default: env/all)")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("index")
    pi.add_argument(
        "--input",
        required=True,
        help="transcripts source: parquet path or catalog table "
        "identifier (db.table — Iceberg when the catalog is Iceberg)",
    )
    pi.add_argument("--out", required=True, help="index output dir")
    pi.add_argument("--shards", type=int, default=64)
    pi.add_argument("--slices", type=int, default=2)
    pi.add_argument("--no-embeddings", action="store_true")
    pi.set_defaults(fn=cmd_index)

    pa = sub.add_parser("append", help="incremental append (delta-only index)")
    pa.add_argument(
        "--input", required=True,
        help="new transcripts: parquet path or catalog identifier",
    )
    pa.add_argument("--index", default=None, help="existing index dir")
    pa.add_argument(
        "--no-dedup", action="store_true",
        help="skip the known-rows anti-join (bulk loads of known-new data)",
    )
    pa.set_defaults(fn=cmd_append)

    pc = sub.add_parser(
        "compact", help="merge append slices; optionally purge a drop list"
    )
    pc.add_argument("--index", default=None, help="existing index dir")
    pc.add_argument("--shards", type=int, default=None, help="target shard count")
    pc.add_argument(
        "--drop", default=None,
        help="parquet of doc_id rows to purge (e.g. near-dup losers)",
    )
    pc.set_defaults(fn=cmd_compact)

    pr = sub.add_parser("repl", help="interactive search session")
    pr.add_argument("--index", default=None)
    pr.add_argument(
        "--pin-mb", dest="pin_mb", type=int, default=1024,
        help="driver memory budget (MB) for pinned vectors AND docs; "
        "0 disables pinning",
    )
    pr.set_defaults(fn=cmd_repl)

    ps = sub.add_parser("search")
    ps.add_argument("query")
    ps.add_argument("--index", default=None,
                    help="index dir (falls back to config paths.index)")
    ps.add_argument("--mode", default="hybrid",
                    choices=["lexical", "semantic", "hybrid", "bm25", "vector", "rrf"])
    ps.add_argument("--limit", type=int, default=None)
    ps.add_argument("--offset", type=int, default=0)
    ps.add_argument("--roles", default=None, help="comma list: user,assistant,tool")
    ps.add_argument("--since", default=None)
    ps.add_argument("--until", default=None)
    ps.add_argument("--sort", default="relevance",
                    choices=["relevance", "date", "date_desc", "engagement"])
    ps.add_argument("--context", action="store_true")
    ps.add_argument("--facet", default=None, metavar="COL|date:UNIT",
                    help="facet counts over the match set instead of "
                         "hits (e.g. role, tool, date:month)")
    ps.add_argument("--collapse", action="store_true",
                    help="best hit per conversation (field collapsing)")
    ps.add_argument("--count", action="store_true",
                    help="print the match-set size instead of hits")
    ps.add_argument("--explain", action="store_true",
                    help="BM25 score breakdown per (top-k doc, matched "
                         "term): tf, df, idf, contribution, total")
    ps.add_argument("--significant-terms", action="store_true",
                    dest="significant_terms",
                    help="terms over-represented in the match set vs "
                         "the corpus, lift-scored (ES significant_terms)"
                         " — replaces the hit list")
    ps.add_argument("--stats", default=None, metavar="COL",
                    dest="stats_col",
                    help="numeric stats + exact percentiles of a doc "
                         "column (or text_len) over the match set (ES "
                         "stats/percentiles) — replaces the hit list")
    ps.add_argument("--fuzzy", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="typo tolerance: expand terms to edit-distance-1 "
                         "vocabulary neighbors (search.fuzzy, config.rs:75; "
                         "default from config; --no-fuzzy overrides a "
                         "config-enabled default)")
    ps.add_argument("--top-hits", type=int, default=None, metavar="K",
                    dest="top_hits",
                    help="with --facet: per-bucket top-K hits beside the "
                         "counts (ES terms + top_hits)")
    ps.add_argument("--rescore", default=None, metavar="QUERY",
                    help="two-phase rescoring: rerank the primary "
                         "top-window by this (typically phrase) query "
                         "(ES rescore; lexical mode)")
    ps.add_argument("--rescore-window", type=int, default=100,
                    dest="rescore_window", metavar="N",
                    help="candidate window for --rescore (default 100)")
    ps.add_argument("--rescore-weight", type=float, default=2.0,
                    dest="rescore_weight", metavar="W",
                    help="secondary weight for --rescore (default 2.0)")
    ps.add_argument("--demote", default=None, metavar="QUERY",
                    help="boosting query: docs matching QUERY stay "
                         "findable at score * --demote-factor "
                         "(Lucene BoostingQuery; lexical mode)")
    ps.add_argument("--demote-factor", type=float, default=0.5,
                    dest="demote_factor", metavar="F",
                    help="demotion multiplier for --demote (default 0.5)")
    ps.add_argument("--half-life", type=float, default=None,
                    dest="half_life", metavar="DAYS",
                    help="recency decay: score *= 0.5^(age_days/DAYS), "
                         "age from the corpus's newest ts (lexical mode)")
    ps.add_argument("--min-should-match", type=int, default=1,
                    metavar="M", dest="min_should_match",
                    help="docs must match >= M clauses of an OR query "
                         "(Lucene minimum_should_match; lexical mode)")
    ps.add_argument("--synonyms", default=None, metavar="JSON|@FILE",
                    help='query-time synonyms, e.g. '
                         '\'{"ml": ["machine learning", "ai"]}\' or '
                         "@synonyms.json; multi-word synonyms match as "
                         "phrases (lexical mode)")
    ps.add_argument("--format", default=None,
                    choices=["text", "json", "json-pretty", "csv", "compact"])
    ps.set_defaults(fn=cmd_search)

    pcfg = sub.add_parser(
        "config", help="show or update user configuration"
    )
    pcfg.add_argument("--set", action="append", metavar="KEY=VALUE",
                      help="assign a config key (repeatable)")
    pcfg.add_argument("--archive", default=None,
                      help="remember a default archive path")
    pcfg.add_argument("--show", action="store_true")
    pcfg.set_defaults(fn=cmd_config)

    pt = sub.add_parser("stats")
    pt.add_argument("--index", default=None)
    pt.add_argument("--detailed", action="store_true")
    pt.add_argument("--temporal", action="store_true",
                    help="render the Temporal Patterns block: activity "
                         "sparkline, hourly sparkline, day-of-week bars "
                         "(main.rs:2208-2285)")
    pt.add_argument("--archive", default=None,
                    help="extracted archive dir: include social-graph "
                         "counts (main.rs:2129-2146)")
    pt.set_defaults(fn=cmd_stats)

    pe = sub.add_parser("export")
    pe.add_argument(
        "--what", default="search",
        choices=["search", "tweets", "likes", "dms", "grok",
                 "followers", "following", "blocks", "mutes", "all"],
        help="search results (default) or a typed record set "
             "(ExportTarget, cli.rs:426-434)",
    )
    pe.add_argument("--index", default=None)
    pe.add_argument("--archive", default=None,
                    help="extracted archive dir (graph-list targets)")
    pe.add_argument("--query", default="")
    pe.add_argument("--limit", type=int, default=1000)
    pe.add_argument("--format", default="json",
                    choices=["json", "jsonl", "csv", "parquet"])
    pe.add_argument("--out", required=True)
    pe.set_defaults(fn=cmd_export)

    pim = sub.add_parser(
        "import", help="extract an X-archive zip and index its members"
    )
    pim.add_argument("zip", help="archive zip file")
    pim.add_argument("--out", required=True, help="extraction directory")
    pim.add_argument("--force", action="store_true",
                     help="replace a previous extraction")
    pim.add_argument("--no-index", action="store_true",
                     help="extract only (run `index` later)")
    pim.add_argument("--index-out", default=None,
                     help="index dir (default: <out>/index)")
    pim.add_argument("--no-embeddings", action="store_true")
    pim.set_defaults(fn=cmd_import)

    pcu = sub.add_parser(
        "curate", help="quality-gate + dedup a corpus (keep/drop pipeline)"
    )
    pcu.add_argument(
        "--input", required=True,
        help="docs: parquet path or catalog identifier",
    )
    pcu.add_argument(
        "--out", required=True,
        help="kept-rows destination: parquet path or catalog identifier",
    )
    pcu.add_argument("--id-col", default="doc_id")
    pcu.add_argument("--text-col", default="text")
    pcu.add_argument("--min-quality", type=float, default=None,
                     help="drop rows with composite quality below this [0,1]")
    pcu.add_argument("--min-tokens", type=int, default=None,
                     help="drop rows with fewer whitespace tokens")
    pcu.add_argument("--dedup", default="exact",
                     choices=["none", "exact", "minhash", "simhash"])
    pcu.add_argument("--threshold", type=float, default=0.8,
                     help="minhash shingle-jaccard threshold")
    pcu.add_argument("--max-hamming", type=int, default=3,
                     help="simhash hamming radius")
    pcu.set_defaults(fn=cmd_curate)

    ppc = sub.add_parser(
        "percolate",
        help="reverse search: which registered queries match each doc "
             "(ES percolator / streaming alerts)",
    )
    ppc.add_argument("--queries", required=True, metavar="FILE.json",
                     help='{"qid": "query", ...} — full query grammar')
    ppc.add_argument("--input", required=True,
                     help="parquet of documents to percolate")
    ppc.add_argument("--out", default=None,
                     help="write (doc_id, qid) pairs as parquet; "
                          "prints per-query counts")
    ppc.add_argument("--id-col", default="doc_id", dest="id_col")
    ppc.add_argument("--text-col", default="text", dest="text_col")
    ppc.add_argument("--role-col", default="role", dest="role_col")
    ppc.add_argument("--format", default="json",
                     choices=["text", "json", "json-pretty", "csv"])
    ppc.set_defaults(fn=cmd_percolate)

    psm = sub.add_parser(
        "similar", help="turns most similar to an existing turn (cosine)"
    )
    psm.add_argument("conv_id")
    psm.add_argument("turn_idx", type=int)
    psm.add_argument("--index", default=None)
    psm.add_argument("--limit", type=int, default=10)
    psm.add_argument("--roles", default=None)
    psm.add_argument("--since", default=None)
    psm.add_argument("--until", default=None)
    psm.add_argument("--format", default="text",
                     choices=["text", "json", "json-pretty", "csv", "compact"])
    psm.set_defaults(fn=cmd_similar)

    pg = sub.add_parser(
        "get", help="show one turn by (conv_id, turn_idx)"
    )
    pg.add_argument("conv_id")
    pg.add_argument("turn_idx", type=int)
    pg.add_argument("--index", default=None)
    pg.add_argument("--context", "-t", action="store_true",
                    help="show the whole conversation (thread analog)")
    pg.add_argument("--format", default="text",
                    choices=["text", "json", "json-pretty", "csv"])
    pg.set_defaults(fn=cmd_get)

    pl = sub.add_parser(
        "list", help="list archive files or index contents"
    )
    pl.add_argument(
        "what", nargs="?", default="files",
        choices=["files", "conversations", "roles", "tools",
                 "followers", "following", "blocks", "mutes",
                 "account", "profile", "manifest"],
    )
    pl.add_argument("--archive", default=None,
                    help="extracted archive dir (for `list files`)")
    pl.add_argument("--index", default=None)
    pl.add_argument("--limit", type=int, default=20)
    pl.add_argument("--format", default="text",
                    choices=["text", "json", "json-pretty", "csv"])
    pl.set_defaults(fn=cmd_list)

    psy = sub.add_parser(
        "sync",
        help="catch an Iceberg-built index up to the table's current "
        "snapshot (manifest diff — appends only new files)",
    )
    psy.add_argument("--table", required=True, help="Iceberg table root")
    psy.add_argument("--index", default=None, help="existing index dir")
    psy.add_argument(
        "--no-dedup", action="store_true",
        help="skip the known-rows anti-join on the appended delta",
    )
    psy.set_defaults(fn=cmd_sync)

    ptb = sub.add_parser("table", help="Iceberg table maintenance")
    tsub = ptb.add_subparsers(dest="table_op", required=True)
    tsnap = tsub.add_parser("snapshots", help="list snapshot history")
    tsnap.add_argument("--table", required=True)
    texp = tsub.add_parser(
        "expire", help="expire old snapshots; reclaim unreachable files"
    )
    texp.add_argument("--table", required=True)
    texp.add_argument("--keep", type=int, default=2,
                      help="snapshots to retain (default 2)")
    torph = tsub.add_parser(
        "orphans", help="remove data dirs no snapshot references"
    )
    torph.add_argument("--table", required=True)
    torph.add_argument("--dry-run", action="store_true")
    tdoc = tsub.add_parser(
        "doctor", help="audit metadata/manifest/data-file consistency"
    )
    tdoc.add_argument("--table", required=True)
    ptb.set_defaults(fn=cmd_table)

    pd_ = sub.add_parser("doctor")
    pd_.add_argument("--index", default=None)
    pd_.add_argument(
        "--repair", action="store_true",
        help="heal what is safely repairable (torn append commit window)",
    )
    pd_.set_defaults(fn=cmd_doctor)

    pcm = sub.add_parser(
        "completions", help="emit a shell completion script"
    )
    pcm.add_argument("shell", nargs="?", default="bash",
                     choices=["bash", "zsh"])
    pcm.set_defaults(fn=cmd_completions)

    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
