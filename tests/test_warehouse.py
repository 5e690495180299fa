"""End-to-end warehouse pipeline test (SURVEY §3): a quote-chain
corpus through ingest → ur-closure → tree stats → wide build →
rollups → sinks, with idempotent re-run."""

from __future__ import annotations

import glob
import json
import os

import pytest

from convoy_spark.pipeline.warehouse import build_warehouse


def _tweet(tid, conv, author="1", reply_to=None, refs=None, likes=0):
    t = {
        "id": str(tid),
        "conversation_id": str(conv),
        "author_id": author,
        "created_at": f"2024-03-{(tid % 27) + 1:02d}T10:00:00.000Z",
        "text": f"tweet {tid}",
        "lang": "en",
        "public_metrics": {
            "retweet_count": 0,
            "reply_count": 0,
            "like_count": likes,
            "quote_count": 0,
        },
    }
    refs = list(refs or [])
    if reply_to is not None:
        refs.append(("replied_to", reply_to))
    if refs:
        t["referenced_tweets"] = [{"type": k, "id": str(v)} for k, v in refs]
    return t


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    landing = tmp_path_factory.mktemp("wh_landing")
    out = tmp_path_factory.mktemp("wh_out")
    # Conversation 100: root(100) + replies 101,102; 102 child of 101.
    # Conversation 200: its root QUOTES 100 -> ur root = 100.
    # Conversation 300: its root QUOTES 200 -> chain, ur root = 100.
    # Conversation 400: standalone singleton.
    page = {
        "data": [
            _tweet(100, 100, author="1", likes=10),
            _tweet(101, 100, author="2", reply_to=100, likes=5),
            _tweet(102, 100, author="3", reply_to=101, likes=1),
            _tweet(200, 200, author="4", refs=[("quoted", 100)], likes=2),
            _tweet(300, 300, author="5", refs=[("quoted", 200)], likes=0),
            _tweet(400, 400, author="1", likes=7),
        ],
        "includes": {"tweets": [], "users": []},
        "errors": [],
    }
    (landing / "pages.jsonl").write_text(json.dumps(page))
    paths = build_warehouse(spark, str(landing), str(out))
    return spark, paths, str(landing), str(out)


def test_ur_enrichment_chain(warehouse):
    spark, paths, _, _ = warehouse
    wide = spark.read.parquet(paths["tweets_wide"])
    got = {r.tweet_id: r.ur_conversation_id for r in wide.collect()}
    assert got[100] == 100 and got[101] == 100 and got[102] == 100
    assert got[200] == 100  # direct quote
    assert got[300] == 100  # transitive through 200
    assert got[400] == 400  # untouched singleton


def test_tree_stats_joined(warehouse):
    spark, paths, _, _ = warehouse
    wide = spark.read.parquet(paths["tweets_wide"])
    s = {r.tweet_id: r for r in wide.collect()}
    assert s[100].n_descendants == 2  # 101, 102
    assert s[100].max_depth == 2
    assert s[101].n_descendants == 1
    assert s[102].n_descendants == 0
    assert s[100].metric_total == 16.0  # 10 + 5 + 1
    assert s[100].n_authors == 3


def test_conversation_rollup(warehouse):
    spark, paths, _, _ = warehouse
    convs = {r.ur_conversation_id: r for r in spark.read.parquet(paths["conversations"]).collect()}
    assert convs[100].n_tweets == 5  # whole ur-tree incl quote chain
    assert convs[100].n_authors == 5
    assert convs[100].total_likes == 18
    assert convs[100].root_text == "tweet 100"
    assert convs[400].n_tweets == 1


def test_partitioned_write(warehouse):
    spark, paths, _, _ = warehouse
    parts = glob.glob(os.path.join(paths["tweets_wide"], "date_created_at=*"))
    assert len(parts) >= 2  # multiple dates -> multiple partitions


def test_schema_clone_empty(warehouse):
    spark, paths, _, _ = warehouse
    clone = spark.read.parquet(paths["tweets_wide_schema"])
    assert clone.count() == 0
    wide_cols = set(spark.read.parquet(paths["tweets_wide"]).columns)
    assert set(clone.columns) == wide_cols


def test_text_sink(warehouse):
    spark, paths, _, _ = warehouse
    lines = {
        r.value for r in spark.read.text(paths["conversation_ids"]).collect()
    }
    assert lines == {"100", "400"}


def test_idempotent_rerun(warehouse):
    spark, paths, landing, out = warehouse
    before = {
        (r.ur_conversation_id, r.n_tweets, r.total_likes)
        for r in spark.read.parquet(paths["conversations"]).collect()
    }
    # full second build into the SAME output dir: overwrite semantics +
    # deterministic results = INSERT IGNORE parity (S8)
    build_warehouse(spark, landing, out)
    after = {
        (r.ur_conversation_id, r.n_tweets, r.total_likes)
        for r in spark.read.parquet(paths["conversations"]).collect()
    }
    assert before == after
