"""Acquisition boundary (SURVEY.md §2.1 S9 + §2.9 ST3), Spark-first.

The reference acquires data with a Selenium crawl loop
(``scraper/main.py:84-136``) and a service wait/retry loop
(``scraper/main.py:48-65``). Neither HTTP nor a browser exists in this
container, so — exactly like the multimodal decode stub — the NETWORK call is
a pluggable function and everything Spark-side is real and tested:

- ``crawl_frontier``: distributed BFS over a link graph. The frontier is a
  DataFrame; each round fetches the frontier via an Arrow-batched
  ``mapInPandas`` (thousands of concurrent fetch tasks on a cluster — the
  reference's sequential per-page loop is the anti-pattern at scale),
  extracts out-links, anti-joins the visited set to form the next frontier,
  and localCheckpoints so lineage stays flat across depths. Politeness at
  scale = ``repartition`` the frontier by host so one task owns one host's
  queue.

- ``with_retry``: bounded exponential-backoff retry for flaky boundary
  actions (the reference's Mongo wait loop). Deterministic (no jitter —
  reproducibility beats thundering-herd here; add jitter at real scale).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

FETCH_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("content", StringType(), True),
        StructField("links", ArrayType(StringType()), True),
    ]
)


def default_fetch(urls) -> tuple[list[str | None], list[list[str]]]:
    """The network boundary. This container has no network route — a real
    deployment passes ``fetch_fn`` explicitly (``urllib_fetch`` below is
    the shipped stdlib implementation; requests/playwright slot in the
    same way). Raises rather than fake-succeeding, so an unconfigured
    crawl fails loudly instead of timing out executor-side."""
    raise NotImplementedError(
        "no network in this environment; pass fetch_fn to crawl_frontier "
        "(e.g. crawl.urllib_fetch)"
    )


def urllib_fetch(
    urls, timeout: float = 10.0
) -> tuple[list[str | None], list[list[str]]]:
    """REAL fetch implementation on stdlib ``urllib`` — the production
    ``fetch_fn`` for ``crawl_frontier`` (reference ``scraper/main.py:84-136``
    drives Selenium page-by-page; here each Arrow batch fetches its slice of
    the frontier in-executor). Handles ``http(s)://`` and ``file://`` URLs
    (the latter lets the integration test drive this exact code path on
    checked-in fixtures with zero network); out-links are parsed with
    ``html.parser`` and resolved against the page URL, so relative hrefs
    crawl correctly. A failed fetch yields (None, []) — recorded as a
    visited dead page, the reference's behavior — never an exception that
    would kill the whole Arrow batch."""
    from html.parser import HTMLParser
    from urllib.parse import urljoin
    from urllib.request import urlopen

    class LinkParser(HTMLParser):
        def __init__(self) -> None:
            super().__init__()
            self.hrefs: list[str] = []

        def handle_starttag(self, tag, attrs):
            if tag == "a":
                self.hrefs.extend(v for k, v in attrs if k == "href" and v)

    contents: list[str | None] = []
    links: list[list[str]] = []
    for u in urls:
        try:
            with urlopen(u, timeout=timeout) as resp:  # noqa: S310 — URL
                # schemes are whatever the caller seeded; scheme policy
                # belongs in the frontier filter, not the fetcher
                body = resp.read().decode("utf-8", "replace")
        except Exception:
            contents.append(None)
            links.append([])
            continue
        p = LinkParser()
        p.feed(body)
        contents.append(body)
        links.append([urljoin(u, h) for h in p.hrefs])
    return contents, links


def crawl_frontier(
    seeds: DataFrame,
    fetch_fn: Callable[[list[str]], tuple[list[str | None], list[list[str]]]]
    | None = None,
    max_depth: int = 3,
) -> DataFrame:
    """S9 — breadth-first crawl as iterative DataFrame algebra.

    ``seeds``: one column ``url``. ``fetch_fn(urls) -> (contents, links)``
    is applied inside ``mapInPandas`` per Arrow batch. Returns
    (url, content, depth): every page fetched exactly once (first depth
    wins), across ``max_depth`` BFS rounds.

    Scale: the visited set stays distributed (anti-join, never collected);
    each round's frontier is checkpointed so the iteration doesn't stack
    lineage — same discipline as ``dedup.connected_components``."""
    fetch = fetch_fn or default_fetch

    def fetch_batches(it: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        for pdf in it:
            urls = pdf["url"].tolist()
            contents, links = fetch(urls)
            yield pd.DataFrame(
                {"url": urls, "content": contents, "links": links}
            )

    frontier = seeds.select("url").distinct().localCheckpoint(eager=True)
    visited = None  # (url, content, depth)
    for depth in range(max_depth + 1):
        fetched = frontier.mapInPandas(fetch_batches, schema=FETCH_SCHEMA)
        pages = fetched.select(
            "url", "content", F.lit(depth).alias("depth")
        ).localCheckpoint(eager=True)
        visited = pages if visited is None else visited.union(pages)
        if depth == max_depth:
            break
        out_links = (
            fetched.select(F.explode_outer("links").alias("url"))
            .filter(F.col("url").isNotNull())
            .distinct()
        )
        frontier = out_links.join(
            visited.select("url"), "url", "left_anti"
        ).localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
    return visited


def with_retry(
    action: Callable[[], Any],
    retries: int = 5,
    base_delay: float = 0.1,
    retry_on: type[BaseException] = Exception,
    sleep: Callable[[float], None] = time.sleep,
) -> Any:
    """ST3 — bounded exponential-backoff retry around a boundary action
    (sink write, service connect). Re-raises the last failure once the
    budget is spent; delay doubles per attempt."""
    last: BaseException | None = None
    for attempt in range(retries + 1):
        try:
            return action()
        except retry_on as exc:  # noqa: PERF203 — retry loop by design
            last = exc
            if attempt < retries:
                sleep(base_delay * (2**attempt))
    assert last is not None
    raise last
