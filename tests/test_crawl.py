"""Distributed crawl-frontier BFS (S9, fetch stubbed) and boundary retry
(ST3): exactly-once visits, depth assignment, frontier exhaustion, backoff."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from projet_data_engineering_spark.crawl import crawl_frontier, with_retry

# Deterministic fake web: a diamond + a tail + an island (never linked).
GRAPH = {
    "a": ["b", "c"],
    "b": ["d"],
    "c": ["d"],
    "d": ["e"],
    "e": [],
    "island": [],
}


def fake_fetch(urls):
    contents = [f"page:{u}" for u in urls]
    links = [GRAPH.get(u, []) for u in urls]
    return contents, links


def test_crawl_bfs_visits_exactly_once_with_min_depth(spark):
    seeds = spark.createDataFrame([Row(url="a")])
    got = {
        r["url"]: (r["content"], r["depth"])
        for r in crawl_frontier(seeds, fake_fetch, max_depth=5).collect()
    }
    # BFS depth = shortest distance from the seed; 'd' reached twice (via b
    # and c) must appear ONCE at its min depth; 'island' never reached.
    assert got == {
        "a": ("page:a", 0),
        "b": ("page:b", 1),
        "c": ("page:c", 1),
        "d": ("page:d", 2),
        "e": ("page:e", 3),
    }


def test_crawl_depth_cap_stops_expansion(spark):
    seeds = spark.createDataFrame([Row(url="a")])
    got = {r["url"] for r in crawl_frontier(seeds, fake_fetch, max_depth=1).collect()}
    assert got == {"a", "b", "c"}


def test_crawl_default_fetch_raises(spark):
    seeds = spark.createDataFrame([Row(url="a")])
    with pytest.raises(Exception, match="no network|NotImplemented"):
        crawl_frontier(seeds, max_depth=0).collect()


def test_with_retry_recovers_after_transient_failures():
    calls = {"n": 0}
    delays: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 4:
            raise ConnectionError("not yet")
        return "up"

    assert with_retry(flaky, retries=5, base_delay=0.01, sleep=delays.append) == "up"
    assert calls["n"] == 4
    assert delays == [0.01, 0.02, 0.04]      # exponential, one per failure


def test_with_retry_exhausts_and_reraises():
    def always_down():
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        with_retry(always_down, retries=2, base_delay=0.0, sleep=lambda _s: None)
