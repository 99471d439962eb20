"""Zip archive import (cmd_import, main.rs:516-657): extraction with
zip-slip protection, then every known member read into one
transcripts-shaped frame via the archive readers."""

from __future__ import annotations

import json
import os
import zipfile

import pytest

from xf_spark.sources.archive import import_archive_zip, read_archive_dir

TWEETS_JS = (
    "window.YTD.tweets.part0 = "
    + json.dumps(
        [
            {"tweet": {
                "id_str": "100",
                "created_at": "Mon Jan 05 10:00:00 +0000 2026",
                "full_text": "first tweet about spark",
                "source": '<a href="http://x.test" rel="nofollow">XClient</a>',
            }},
            {"tweet": {
                "id_str": "101",
                "created_at": "Tue Jan 06 11:00:00 +0000 2026",
                "full_text": "second tweet about rust",
                "source": None,
            }},
            {"tweet": {  # duplicate id: parser.rs seen_ids dedup
                "id_str": "100",
                "created_at": "Mon Jan 05 10:00:00 +0000 2026",
                "full_text": "first tweet about spark",
                "source": '<a href="http://x.test" rel="nofollow">XClient</a>',
            }},
        ]
    )
    + ";"
)

LIKE_JS = (
    "window.YTD.like.part0 = "
    + json.dumps([
        {"like": {"tweetId": "900", "fullText": "a liked post",
                  "expandedUrl": "http://x.test/900"}},
        {"like": {"tweetId": "901", "fullText": None,
                  "expandedUrl": "http://x.test/901"}},  # textless: dropped
    ])
    + ";"
)

DMS_JS = (
    "window.YTD.direct_messages.part0 = "
    + json.dumps([
        {"dmConversation": {
            "conversationId": "7-8",
            "messages": [
                {"messageCreate": {
                    "id": "2", "senderId": "8", "text": "reply",
                    "createdAt": "Mon Jan 05 10:01:00 +0000 2026"}},
                {"messageCreate": {
                    "id": "1", "senderId": "7", "text": "hello there",
                    "createdAt": "Mon Jan 05 10:00:00 +0000 2026"}},
            ],
        }}
    ])
    + ";"
)


FOLLOWER_JS = (
    "window.YTD.follower.part0 = "
    + json.dumps([
        {"follower": {"accountId": "501", "userLink": "https://x.test/501"}},
        {"follower": {"accountId": "502", "userLink": None}},
        {"follower": {"accountId": "501", "userLink": "https://x.test/501"}},  # dup
        {"follower": {"userLink": "https://x.test/999"}},  # no accountId: dropped
    ])
    + ";"
)

BLOCK_JS = (  # block.js wraps items as "blocking" (parser.rs:505)
    "window.YTD.block.part0 = "
    + json.dumps([{"blocking": {"accountId": "601", "userLink": None}}])
    + ";"
)

ACCOUNT_JS = (
    "window.YTD.account.part0 = "
    + json.dumps([{"account": {
        "accountId": "42", "username": "tester",
        "accountDisplayName": "Test Er", "email": "t@x.test",
        "createdAt": "2020-01-02T03:04:05.000Z", "createdVia": "web",
    }}])
    + ";"
)

PROFILE_JS = (
    "window.YTD.profile.part0 = "
    + json.dumps([{"profile": {
        "description": {"bio": "a bio", "website": "https://t.example",
                        "location": "somewhere"},
        "avatarMediaUrl": "https://x.test/a.jpg",
        "headerMediaUrl": None,
    }}])
    + ";"
)

MANIFEST_JS = (  # object wrapper, NOT window.YTD (parse_manifest)
    "window.__THAR_CONFIG = "
    + json.dumps({
        "userInfo": {"accountId": "42", "userName": "tester",
                     "displayName": "Test Er"},
        "archiveInfo": {"sizeBytes": "12345",
                        "generationDate": "2026-01-07T00:00:00.000Z",
                        "isPartialArchive": False},
    })
    + ";"
)


@pytest.fixture(scope="module")
def archive_zip(tmp_path_factory):
    root = tmp_path_factory.mktemp("zipsrc")
    zp = str(root / "x-archive.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("data/tweets.js", TWEETS_JS)
        zf.writestr("data/like.js", LIKE_JS)
        zf.writestr("data/direct-messages.js", DMS_JS)
        zf.writestr("data/follower.js", FOLLOWER_JS)
        zf.writestr("data/block.js", BLOCK_JS)
        zf.writestr("data/account.js", ACCOUNT_JS)
        zf.writestr("data/profile.js", PROFILE_JS)
        zf.writestr("data/manifest.js", MANIFEST_JS)
        zf.writestr("../evil.txt", "zip-slip payload")
    return zp


def test_extract_skips_zip_slip(archive_zip, tmp_path):
    out = str(tmp_path / "extracted")
    n_files, n_bytes = import_archive_zip(archive_zip, out)
    assert n_files == 8 and n_bytes > 0  # evil.txt skipped
    assert os.path.isfile(os.path.join(out, "data", "tweets.js"))
    assert not os.path.exists(os.path.join(os.path.dirname(out), "evil.txt"))


def test_force_replaces_previous_extraction(archive_zip, tmp_path):
    out = str(tmp_path / "extracted")
    import_archive_zip(archive_zip, out)
    stale = os.path.join(out, "stale.txt")
    open(stale, "w").write("old")
    import_archive_zip(archive_zip, out, force=True)
    assert not os.path.exists(stale)


def test_read_archive_dir_unions_members(spark, archive_zip, tmp_path):
    out = str(tmp_path / "extracted")
    import_archive_zip(archive_zip, out)
    df = read_archive_dir(spark, out)
    assert df.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    allrows = df.collect()
    rows = {r["conv_id"]: r for r in allrows if not r["conv_id"].startswith("dm_")}
    # tweets: dedup by id, source anchor text -> tool, None source -> ''
    assert rows["tweet_100"]["tool"] == "XClient"
    assert rows["tweet_101"]["tool"] == ""
    assert sum(1 for c in rows if c.startswith("tweet_")) == 2
    # likes: textless like dropped
    assert rows["like_900"]["text"] == "a liked post"
    assert "like_901" not in rows
    # dms: parsed-ts ordering, not file order
    dm = sorted(
        (r for r in allrows if r["conv_id"] == "dm_7-8"),
        key=lambda r: r["turn_idx"],
    )
    assert [r["text"] for r in dm] == ["hello there", "reply"]
    assert [r["role"] for r in dm] == ["7", "8"]


def test_empty_archive_raises(spark, tmp_path):
    os.makedirs(tmp_path / "data", exist_ok=True)
    with pytest.raises(ValueError):
        read_archive_dir(spark, str(tmp_path))


def test_cli_import_end_to_end(archive_zip, tmp_path):
    import subprocess
    import sys

    out = str(tmp_path / "cliout")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "xf_spark", "--cores", "4", "import",
         archive_zip, "--out", out, "--no-embeddings"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "extracted 8 files" in r.stdout
    assert "indexed 5 turns" in r.stdout  # 2 tweets + 1 like + 2 dms
    assert os.path.isfile(os.path.join(out, "index", "meta.json"))


def test_graph_and_singleton_readers(spark, archive_zip, tmp_path):
    """follower/block lists + account/profile/manifest singletons
    (parser.rs:455-544, 551-592, 95-121)."""
    from xf_spark.sources.archive import (
        read_account,
        read_graph_list,
        read_manifest,
        read_profile,
    )

    out = str(tmp_path / "extracted")
    import_archive_zip(archive_zip, out)
    data = os.path.join(out, "data")

    fol = read_graph_list(spark, os.path.join(data, "follower.js"), "follower")
    rows = {r["account_id"]: r["user_link"] for r in fol.collect()}
    # dup collapsed, missing accountId dropped, null link kept
    assert rows == {"501": "https://x.test/501", "502": None}

    blk = read_graph_list(spark, os.path.join(data, "block.js"), "block")
    assert [r["account_id"] for r in blk.collect()] == ["601"]

    with pytest.raises(ValueError):
        read_graph_list(spark, data, "enemies")

    acct = read_account(spark, os.path.join(data, "account.js")).collect()
    assert len(acct) == 1
    a = acct[0]
    assert (a["account_id"], a["username"], a["display_name"]) == (
        "42", "tester", "Test Er"
    )
    assert a["created_at"] is not None and a["created_via"] == "web"

    prof = read_profile(spark, os.path.join(data, "profile.js")).collect()[0]
    assert prof["bio"] == "a bio" and prof["location"] == "somewhere"
    assert prof["header_url"] is None

    man = read_manifest(spark, os.path.join(data, "manifest.js")).collect()[0]
    assert man["account_id"] == "42" and man["username"] == "tester"
    assert man["archive_size_bytes"] == 12345  # JSON string -> long
    assert man["is_partial"] is False and man["generation_date"] is not None


def test_cli_list_followers_and_manifest(archive_zip, tmp_path):
    import subprocess
    import sys

    out = str(tmp_path / "cliout")
    import_archive_zip(archive_zip, out)
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "xf_spark", "--cores", "4", "list",
         "followers", "--archive", out, "--format", "json"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    got = {x["account_id"] for x in json.loads(r.stdout.strip().splitlines()[-1])}
    assert got == {"501", "502"}
    r = subprocess.run(
        [sys.executable, "-m", "xf_spark", "--cores", "4", "list",
         "manifest", "--archive", out, "--format", "json"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])[0]
    assert m["archive_size_bytes"] == 12345


def test_cli_export_typed_targets(archive_zip, tmp_path):
    """export --what tweets/followers/all (ExportTarget, cli.rs:426-434):
    per-member limit, type-tagged combined JSONL."""
    import glob
    import subprocess
    import sys

    out = str(tmp_path / "cliout")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "xf_spark", "--cores", "4", "import",
         archive_zip, "--out", out, "--no-embeddings"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    idx = os.path.join(out, "index")

    def _lines(d):
        rows = []
        for f in glob.glob(os.path.join(d, "part-*")):
            with open(f) as fh:
                rows += [json.loads(x) for x in fh if x.strip()]
        return rows

    tw_out = str(tmp_path / "tweets_export")
    r = subprocess.run(
        [sys.executable, "-m", "xf_spark", "--cores", "4", "export",
         "--what", "tweets", "--index", idx, "--out", tw_out],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    tw = _lines(tw_out)
    assert {t["conv_id"] for t in tw} == {"tweet_100", "tweet_101"}

    fol_out = str(tmp_path / "followers_export")
    r = subprocess.run(
        [sys.executable, "-m", "xf_spark", "--cores", "4", "export",
         "--what", "followers", "--archive", out, "--out", fol_out],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert {f["account_id"] for f in _lines(fol_out)} == {"501", "502"}

    all_out = str(tmp_path / "all_export")
    r = subprocess.run(
        [sys.executable, "-m", "xf_spark", "--cores", "4", "export",
         "--what", "all", "--index", idx, "--archive", out,
         "--format", "jsonl", "--out", all_out],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = _lines(all_out)
    by_type = {}
    for x in rows:
        by_type.setdefault(x["type"], []).append(x["data"])
    # every member present in the archive is included (mutes/following
    # absent from the fixture, so absent here — not silently dropped)
    assert sorted(by_type) == ["block", "dm", "follower", "like", "tweet"]
    assert len(by_type["tweet"]) == 2 and len(by_type["dm"]) == 2
    assert by_type["follower"][0]["account_id"] == "501"
    assert by_type["block"][0]["account_id"] == "601"
    assert all(isinstance(x["data"], dict) for x in rows)

    # csv for 'all' refused (main.rs:2848-2852)
    r = subprocess.run(
        [sys.executable, "-m", "xf_spark", "--cores", "4", "export",
         "--what", "all", "--index", idx, "--format", "csv",
         "--out", str(tmp_path / "nope")],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert r.returncode != 0

    # stats --archive: doc-type + social-graph counts (main.rs:2100-2146)
    r = subprocess.run(
        [sys.executable, "-m", "xf_spark", "--cores", "4", "stats",
         "--index", idx, "--archive", out],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    s = json.loads(r.stdout[r.stdout.index("{"):])
    assert s["doc_types"] == {
        "tweets": 2, "likes": 1, "dm_messages": 2,
        "dm_conversations": 1, "grok_messages": 0,
    }
    assert s["graph"] == {
        "followers": 2, "following": 0, "blocks": 1, "mutes": 0,
    }


def test_config_drives_cli_defaults(archive_zip, tmp_path):
    """Config-file wiring (cmd_config main.rs:2941-2969 + the live
    search.fuzzy knob): paths.index / search.default_limit /
    search.fuzzy / output.format all resolve from config when the flag
    is absent; indexing.skip_types drops members at import."""
    import subprocess
    import sys

    cfg_path = str(tmp_path / "config.json")
    env = dict(os.environ, PYTHONPATH="/root/repo", XF_SPARK_CONFIG=cfg_path)
    env.pop("XF_LIMIT", None)

    def run(*argv):
        return subprocess.run(
            [sys.executable, "-m", "xf_spark", "--cores", "4", *argv],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )

    # skip likes+dms at import via config
    r = run("config", "--set", "indexing.skip_types=like,dm")
    assert r.returncode == 0, r.stderr[-2000:]
    out = str(tmp_path / "cliout")
    r = run("import", archive_zip, "--out", out, "--no-embeddings")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "skipping member types: like,dm" in r.stdout
    assert "indexed 2 turns" in r.stdout  # tweets only

    # bad key rejected
    r = run("config", "--set", "search.bogus=1")
    assert r.returncode == 1 and "Unknown config key" in r.stdout

    # search with NO --index/--limit/--format/--fuzzy: all from config;
    # 'spar' only matches via fuzzy expansion to 'spark'
    idx = os.path.join(out, "index")
    r = run("config", "--set", "search.fuzzy=true",
            "--set", "search.default_limit=1",
            "--set", f"paths.index={idx}",
            "--set", "output.format=json")
    assert r.returncode == 0, r.stderr[-2000:]
    r = run("search", "spar", "--mode", "lexical")
    assert r.returncode == 0, r.stderr[-2000:]
    rows = json.loads(r.stdout.strip().splitlines()[-1])
    assert len(rows) == 1 and rows[0]["conv_id"] == "tweet_100"

    # flag still wins over config
    r = run("search", "spar", "--mode", "lexical", "--limit", "2",
            "--format", "json")
    rows = json.loads(r.stdout.strip().splitlines()[-1])
    assert {x["conv_id"] for x in rows} == {"tweet_100"}  # only 1 match

    # paths.index serves EVERY index-taking command (get_index_path
    # resolution), and indexing.threads supplies cores when --cores
    # is absent
    r = run("config", "--set", "indexing.threads=4")
    assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run(
        [sys.executable, "-m", "xf_spark", "stats"],  # no --index/--cores
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout[r.stdout.index("{"):])["n_turns"] == 2
    r = subprocess.run(
        [sys.executable, "-m", "xf_spark", "doctor"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
