"""Query registry backing ``__spark_entry__.py``.

Every operator module registers its driver-checkable queries here with the
``@query`` decorator: a name, a ``(spark, sf_dir) -> DataFrame`` callable and
(where SQL-expressible) the equivalent DuckDB oracle SQL. Column names are
aliased identically on both sides — the driver's compare sorts columns by name
and hashes values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a driver query; ``oracle=None`` marks non-SQL-expressible ops
    (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every operator module so decorators run.

    Import order IS registration order IS the order a budget-limited checker
    walks ``queries()``: families with the least accumulated driver-side
    correctness evidence are imported first so a truncated sweep still covers
    them (round-1 sweep stopped after analytic/dedup/etl/multimodal and the
    head of relational — those now go last)."""
    global _LOADED
    if _LOADED:
        return
    from projet_data_engineering_spark.streaming import windows  # noqa: F401
    from projet_data_engineering_spark.operators import (  # noqa: F401
        search,
        similarity,
        skew,
        textanalysis,
        relational,
        analytic,
        dedup,
        etl,
        multimodal,
    )

    _LOADED = True
