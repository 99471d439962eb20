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


@pytest.fixture(scope="module")
def archive_zip(tmp_path_factory):
    root = tmp_path_factory.mktemp("zipsrc")
    zp = str(root / "x-archive.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("data/tweets.js", TWEETS_JS)
        zf.writestr("data/like.js", LIKE_JS)
        zf.writestr("data/direct-messages.js", DMS_JS)
        zf.writestr("data/manifest.js", "window.YTD.manifest.part0 = [];")
        zf.writestr("../evil.txt", "zip-slip payload")
    return zp


def test_extract_skips_zip_slip(archive_zip, tmp_path):
    out = str(tmp_path / "extracted")
    n_files, n_bytes = import_archive_zip(archive_zip, out)
    assert n_files == 4 and n_bytes > 0  # evil.txt skipped
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
    assert "extracted 4 files" in r.stdout
    assert "indexed 5 turns" in r.stdout  # 2 tweets + 1 like + 2 dms
    assert os.path.isfile(os.path.join(out, "index", "meta.json"))
