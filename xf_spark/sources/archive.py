"""Archive source readers (SURVEY.md §2.1).

The reference ingests JS-wrapped JSON archive files
(``window.YTD.<type>.part<n> = [...]``, parser.rs:34-51). The Spark
re-expression: read whole files as text, strip the JS wrapper with a
regexp, parse with from_json against an explicit schema, explode.
Dedup-by-id on multi-part files mirrors parser.rs:144-198.

Plus the timestamp grammar (parser.rs:76-88): X's
"Fri Jan 09 15:12:21 +0000 2026" format and ISO-8601.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

# X's legacy format "Fri Jan 09 15:12:21 +0000 2026" (parser.rs:76-81).
# Spark 3+ datetime patterns reject weekday fields, so the weekday
# prefix is stripped before parsing the remainder.
X_TS_FORMAT = "MMM dd HH:mm:ss Z yyyy"


def parse_ts_flexible(col):
    """Parse either X's legacy format or ISO-8601 (parser.rs:76-88)."""
    without_dow = F.regexp_replace(col, r"^[A-Za-z]{3} ", "")
    return F.coalesce(
        F.try_to_timestamp(without_dow, F.lit(X_TS_FORMAT)),
        F.try_to_timestamp(col),
    )


def _stripped_json(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Whole-file read with the JS wrapper removed — the reference
    splits on the FIRST '=' and trims a trailing ';' (parse_js_file,
    parser.rs:34-51), which handles both ``window.YTD.<type>.part<n>``
    members and manifest.js's ``window.__THAR_CONFIG`` wrapper."""
    raw = spark.read.text(path, wholetext=True)
    return raw.select(
        F.regexp_replace(
            F.regexp_replace(F.col("value"), r"^[^=]*=\s*", ""),
            r";\s*$",
            "",
        ).alias("json")
    )


def read_js_archive(
    spark: SparkSession,
    path: str | list[str],
    item_schema: T.StructType,
    dedup_key: str | None = "id",
) -> DataFrame:
    """Read ``window.YTD.*.part* = [ ... ];`` files into rows.

    wholetext read -> strip wrapper prefix + trailing ';' -> from_json
    as array<item_schema> -> explode -> optional dropDuplicates.
    At scale each file is one task; archives shard naturally by file."""
    stripped = _stripped_json(spark, path)
    arr = stripped.select(
        F.from_json("json", T.ArrayType(item_schema)).alias("items")
    )
    out = arr.select(F.explode("items").alias("item")).select("item.*")
    if dedup_key and dedup_key in out.columns:
        out = out.dropDuplicates([dedup_key])
    return out


# Transcript-shaped conversation archive: the DM-grouping analog
# (parse_direct_messages, parser.rs:327-435): messages grouped into
# conversations, per-conversation sort, id dedup.
CONVERSATION_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.StringType()),
    ]
)


def read_transcript_archive(spark: SparkSession, path: str) -> DataFrame:
    """JS-wrapped transcript archive -> the input_hint table, with
    per-conversation stable ordering and (conv_id, turn_idx) dedup."""
    items = read_js_archive(spark, path, CONVERSATION_ITEM_SCHEMA, dedup_key=None)
    return (
        items.dropDuplicates(["conv_id", "turn_idx"])
        .withColumn("ts", parse_ts_flexible(F.col("ts")))
        .repartitionByRange("conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
    )


# ---------------------------------------------------------------------------
# Reference-format archive readers -> the unified doc space
# (search.rs:213-247: one searchable doc per record, doc-type in role)
# ---------------------------------------------------------------------------

GROK_ITEM_SCHEMA = T.StructType(
    [
        T.StructField(
            "grokChatItem",
            T.StructType(
                [
                    T.StructField("chatId", T.StringType()),
                    T.StructField("message", T.StringType()),
                    T.StructField("sender", T.StringType()),
                    T.StructField("createdAt", T.StringType()),
                    T.StructField("grokMode", T.StringType()),
                ]
            ),
        )
    ]
)

LIKE_ITEM_SCHEMA = T.StructType(
    [
        T.StructField(
            "like",
            T.StructType(
                [
                    T.StructField("tweetId", T.StringType()),
                    T.StructField("fullText", T.StringType()),
                    T.StructField("expandedUrl", T.StringType()),
                ]
            ),
        )
    ]
)

DM_ITEM_SCHEMA = T.StructType(
    [
        T.StructField(
            "dmConversation",
            T.StructType(
                [
                    T.StructField("conversationId", T.StringType()),
                    T.StructField(
                        "messages",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField(
                                        "messageCreate",
                                        T.StructType(
                                            [
                                                T.StructField("id", T.StringType()),
                                                T.StructField("senderId", T.StringType()),
                                                T.StructField("recipientId", T.StringType()),
                                                T.StructField("text", T.StringType()),
                                                T.StructField("createdAt", T.StringType()),
                                            ]
                                        ),
                                    )
                                ]
                            )
                        ),
                    ),
                ]
            ),
        )
    ]
)


def read_grok_archive(spark: SparkSession, path: str) -> DataFrame:
    """grok-chat-item.js -> transcript rows: conv = chatId, turns
    ordered by createdAt, role = sender (parser.rs grok path)."""
    from pyspark.sql.window import Window

    items = read_js_archive(spark, path, GROK_ITEM_SCHEMA, dedup_key=None)
    g = items.select("grokChatItem.*")
    # order by the PARSED timestamp: the legacy X format ("Mon Jan 05
    # 10:00:00 +0000 2026") sorts by weekday name as a raw string,
    # scrambling turn order (parse_ts_flexible exists precisely
    # because this column carries that format)
    w = Window.partitionBy("chatId").orderBy(
        parse_ts_flexible(F.col("createdAt")), "createdAt", "message"
    )
    return g.select(
        F.concat(F.lit("grok_"), "chatId").alias("conv_id"),
        F.row_number().over(w).alias("turn_idx"),
        F.col("sender").alias("role"),
        F.col("message").alias("text"),
        F.lit("").alias("tool"),
        parse_ts_flexible(F.col("createdAt")).alias("ts"),
    )


def read_like_archive(spark: SparkSession, path: str) -> DataFrame:
    """like.js -> one standalone doc per like with fullText (likes
    without text are unindexable, parser.rs like path)."""
    items = read_js_archive(spark, path, LIKE_ITEM_SCHEMA, dedup_key=None)
    lk = items.select("like.*").where(F.col("fullText").isNotNull())
    return lk.select(
        F.concat(F.lit("like_"), "tweetId").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("like").alias("role"),
        F.col("fullText").alias("text"),
        F.lit("").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def read_dm_archive(spark: SparkSession, path: str) -> DataFrame:
    """direct-messages.js -> transcript rows: conv = conversationId,
    turns ordered by (createdAt, id), role = senderId
    (parse_direct_messages, parser.rs:327-435)."""
    from pyspark.sql.window import Window

    items = read_js_archive(spark, path, DM_ITEM_SCHEMA, dedup_key=None)
    d = items.select("dmConversation.*").select(
        "conversationId", F.explode("messages").alias("m")
    )
    # parsed-timestamp ordering (same weekday-name string trap as the
    # grok reader); the raw string + id stay as deterministic tiebreaks
    w = Window.partitionBy("conversationId").orderBy(
        parse_ts_flexible(F.col("m.messageCreate.createdAt")),
        "m.messageCreate.createdAt",
        "m.messageCreate.id",
    )
    return d.select(
        F.concat(F.lit("dm_"), "conversationId").alias("conv_id"),
        F.row_number().over(w).alias("turn_idx"),
        F.col("m.messageCreate.senderId").alias("role"),
        F.col("m.messageCreate.text").alias("text"),
        F.lit("").alias("tool"),
        parse_ts_flexible(F.col("m.messageCreate.createdAt")).alias("ts"),
    )


def conversations_grouped(transcripts: DataFrame) -> DataFrame:
    """Conversation view: sorted struct array per conv_id — the
    DmConversation{conversation_id, messages} shape (model.rs:63-67),
    ordering pinned by sort_array over (turn_idx, ...) structs."""
    return transcripts.groupBy("conv_id").agg(
        F.sort_array(
            F.collect_list(F.struct("turn_idx", "role", "text", "tool", "ts"))
        ).alias("messages"),
        F.count("*").alias("n_turns"),
    )


# ---------------------------------------------------------------------------
# Tweets source + zip import (cmd_import, main.rs:516-657): the entry
# point a reference user actually starts from — an X-archive zip.
# ---------------------------------------------------------------------------

TWEET_ITEM_SCHEMA = T.StructType(
    [
        T.StructField(
            "tweet",
            T.StructType(
                [
                    T.StructField("id_str", T.StringType()),
                    T.StructField("created_at", T.StringType()),
                    T.StructField("full_text", T.StringType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        )
    ]
)


def read_tweet_archive(spark: SparkSession, path: str) -> DataFrame:
    """tweets.js / tweets-part*.js -> one standalone doc per tweet
    (parse_tweets, parser.rs:123-199): dedup by id_str, text =
    full_text, tool = the client name extracted from the HTML anchor
    in ``source`` (parser.rs:162-169)."""
    items = read_js_archive(spark, path, TWEET_ITEM_SCHEMA, dedup_key=None)
    tw = items.select("tweet.*").where(
        F.col("id_str").isNotNull() & F.col("full_text").isNotNull()
    )
    tw = tw.dropDuplicates(["id_str"])
    src_text = F.coalesce(
        F.nullif(F.regexp_extract(F.col("source"), r">([^<]*)<", 1), F.lit("")),
        F.col("source"),
        F.lit(""),
    )
    return tw.select(
        F.concat(F.lit("tweet_"), "id_str").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("tweet").alias("role"),
        F.col("full_text").alias("text"),
        src_text.alias("tool"),
        parse_ts_flexible(F.col("created_at")).alias("ts"),
    )


def import_archive_zip(
    zip_path: str, out_dir: str, force: bool = False
) -> tuple[int, int]:
    """Extract an X-archive zip into ``out_dir`` (cmd_import,
    main.rs:573-612): zip-slip-safe (entries resolving outside the
    output dir are skipped, the enclosed_name() semantics), returns
    (n_files, n_bytes). Driver-side by design — the zip format is not
    splittable; the EXTRACTED files shard naturally by file across
    executors via the readers above."""
    import os
    import shutil
    import zipfile

    if force and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    base = os.path.realpath(out_dir)
    n_files = 0
    n_bytes = 0
    with zipfile.ZipFile(zip_path) as zf:
        for info in zf.infolist():
            target = os.path.realpath(os.path.join(out_dir, info.filename))
            if target != base and not target.startswith(base + os.sep):
                continue  # zip-slip entry
            if info.is_dir():
                os.makedirs(target, exist_ok=True)
                continue
            os.makedirs(os.path.dirname(target), exist_ok=True)
            with zf.open(info) as src, open(target, "wb") as dst:
                shutil.copyfileobj(src, dst)
            n_files += 1
            n_bytes += info.file_size
    return n_files, n_bytes


def read_archive_dir(
    spark: SparkSession, root: str, skip: list[str] | tuple = ()
) -> DataFrame:
    """Union every known archive member under ``root/data`` into one
    transcripts-shaped frame (the post-extract index pass,
    main.rs:634-657 -> parser.rs member discovery: tweets.js +
    tweets-part*.js, like.js | likes.js, direct-messages.js +
    direct-messages-group*.js, grok-chat-item.js). Members that are
    absent are skipped; at least one must exist. ``skip`` drops member
    types by name (tweet/like/dm/grok — the indexing.skip_types config,
    config.rs IndexingConfig + the --only filter, main.rs:890-898)."""
    import glob as _glob
    import os

    unknown = set(skip) - {"tweet", "like", "dm", "grok"}
    if unknown:
        raise ValueError(f"unknown skip types: {sorted(unknown)}")
    data = os.path.join(root, "data")
    parts = []
    tweet_files = sorted(
        _glob.glob(os.path.join(data, "tweets.js"))
        + _glob.glob(os.path.join(data, "tweets-part*.js"))
    )
    if tweet_files and "tweet" not in skip:
        parts.append(read_tweet_archive(spark, tweet_files))
    like_files = sorted(
        _glob.glob(os.path.join(data, "like.js"))
        + _glob.glob(os.path.join(data, "likes.js"))
    )
    if like_files and "like" not in skip:
        parts.append(read_like_archive(spark, like_files))
    dm_files = sorted(
        _glob.glob(os.path.join(data, "direct-messages.js"))
        + _glob.glob(os.path.join(data, "direct-messages-group*.js"))
    )
    if dm_files and "dm" not in skip:
        parts.append(read_dm_archive(spark, dm_files))
    grok_files = sorted(_glob.glob(os.path.join(data, "grok-chat-item.js")))
    if grok_files and "grok" not in skip:
        parts.append(read_grok_archive(spark, grok_files))
    if not parts:
        raise ValueError(f"no archive members found under {data}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Social-graph lists + account/profile/manifest singletons
# (parser.rs:455-544, 551-592, 95-121). The reference parses these into
# SQLite so `list`/`export`/`stats` can re-read them; our analog reads
# them straight off the extracted archive — the Spark read IS the job,
# file-sharded, no intermediate store needed.
# ---------------------------------------------------------------------------

# member file -> JSON wrapper key (block.js wraps items as "blocking",
# mute.js as "muting" — parser.rs:505,531)
GRAPH_WRAPPERS = {
    "follower": "follower",
    "following": "following",
    "block": "blocking",
    "mute": "muting",
}


def read_graph_list(spark: SparkSession, path: str | list[str], kind: str) -> DataFrame:
    """follower.js / following.js / block.js / mute.js -> one row per
    account: (account_id, user_link), rows without accountId dropped,
    deduped by account_id (parse_followers/_following/_blocks/_mutes,
    parser.rs:455-544)."""
    if kind not in GRAPH_WRAPPERS:
        raise ValueError(f"unknown graph list {kind!r} (one of {sorted(GRAPH_WRAPPERS)})")
    wrapper = GRAPH_WRAPPERS[kind]
    schema = T.StructType(
        [
            T.StructField(
                wrapper,
                T.StructType(
                    [
                        T.StructField("accountId", T.StringType()),
                        T.StructField("userLink", T.StringType()),
                    ]
                ),
            )
        ]
    )
    items = read_js_archive(spark, path, schema, dedup_key=None)
    return (
        items.select(f"{wrapper}.*")
        .where(F.col("accountId").isNotNull())
        .select(
            F.col("accountId").alias("account_id"),
            F.col("userLink").alias("user_link"),
        )
        .dropDuplicates(["account_id"])
    )


ACCOUNT_ITEM_SCHEMA = T.StructType(
    [
        T.StructField(
            "account",
            T.StructType(
                [
                    T.StructField("accountId", T.StringType()),
                    T.StructField("username", T.StringType()),
                    T.StructField("accountDisplayName", T.StringType()),
                    T.StructField("email", T.StringType()),
                    T.StructField("createdAt", T.StringType()),
                    T.StructField("createdVia", T.StringType()),
                ]
            ),
        )
    ]
)


def read_account(spark: SparkSession, path: str) -> DataFrame:
    """account.js -> the one-row Account singleton (parse_account,
    parser.rs:551-569: first array element wins)."""
    items = read_js_archive(spark, path, ACCOUNT_ITEM_SCHEMA, dedup_key=None)
    return (
        items.select("account.*")
        .limit(1)
        .select(
            F.col("accountId").alias("account_id"),
            "username",
            F.col("accountDisplayName").alias("display_name"),
            "email",
            parse_ts_flexible(F.col("createdAt")).alias("created_at"),
            F.col("createdVia").alias("created_via"),
        )
    )


PROFILE_ITEM_SCHEMA = T.StructType(
    [
        T.StructField(
            "profile",
            T.StructType(
                [
                    T.StructField(
                        "description",
                        T.StructType(
                            [
                                T.StructField("bio", T.StringType()),
                                T.StructField("website", T.StringType()),
                                T.StructField("location", T.StringType()),
                            ]
                        ),
                    ),
                    T.StructField("avatarMediaUrl", T.StringType()),
                    T.StructField("headerMediaUrl", T.StringType()),
                ]
            ),
        )
    ]
)


def read_profile(spark: SparkSession, path: str) -> DataFrame:
    """profile.js -> the one-row Profile singleton (parse_profile,
    parser.rs:575-592)."""
    items = read_js_archive(spark, path, PROFILE_ITEM_SCHEMA, dedup_key=None)
    return (
        items.select("profile.*")
        .limit(1)
        .select(
            F.col("description.bio").alias("bio"),
            F.col("description.website").alias("website"),
            F.col("description.location").alias("location"),
            F.col("avatarMediaUrl").alias("avatar_url"),
            F.col("headerMediaUrl").alias("header_url"),
        )
    )


MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField(
            "userInfo",
            T.StructType(
                [
                    T.StructField("accountId", T.StringType()),
                    T.StructField("userName", T.StringType()),
                    T.StructField("displayName", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "archiveInfo",
            T.StructType(
                [
                    T.StructField("sizeBytes", T.StringType()),
                    T.StructField("generationDate", T.StringType()),
                    T.StructField("isPartialArchive", T.BooleanType()),
                ]
            ),
        ),
    ]
)


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    """manifest.js -> the one-row ArchiveInfo (parse_manifest,
    parser.rs:95-121). The wrapper is an OBJECT under
    ``window.__THAR_CONFIG =`` — same first-'=' strip, object schema;
    sizeBytes arrives as a JSON string and is cast (parse_i64)."""
    obj = _stripped_json(spark, path).select(
        F.from_json("json", MANIFEST_SCHEMA).alias("m")
    )
    return obj.limit(1).select(
        F.col("m.userInfo.accountId").alias("account_id"),
        F.col("m.userInfo.userName").alias("username"),
        F.col("m.userInfo.displayName").alias("display_name"),
        F.coalesce(
            F.col("m.archiveInfo.sizeBytes").cast("long"), F.lit(0)
        ).alias("archive_size_bytes"),
        parse_ts_flexible(F.col("m.archiveInfo.generationDate")).alias(
            "generation_date"
        ),
        F.coalesce(F.col("m.archiveInfo.isPartialArchive"), F.lit(False)).alias(
            "is_partial"
        ),
    )
