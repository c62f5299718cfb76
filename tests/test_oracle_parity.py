"""Every registered query hash-matches its DuckDB oracle at sf0.001 — the
local twin of the driver's correctness gate (SURVEY.md §5.2.1)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from projet_data_engineering_spark import TABLES
from tests.conftest import SF_DIR
from tools.check import canon, table_hash

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con


def test_every_query_has_callable():
    assert len(QUERIES) >= 60
    assert set(ORACLES) <= set(QUERIES)


# The heavyweight composed/streaming parametrizations run in the FULL
# lane only (pytest.ini fast-lane contract, r12): each is >12 s of
# end-to-end stream/index machinery, and the driver's own oracle gate
# covers every one of these queries independently every round.
_SLOW_PARITY = {
    "q_stream_stack", "q_stream_pq_refresh", "q_stream_dedup_ingest",
    "q_curation_funnel", "q_pq_served", "q_pq_encode",
    "q_stream_ann_refresh",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_PARITY else n
        for n in sorted(ORACLES)
    ],
)
def test_oracle_parity(name, spark, duck):
    """Canonicalize BOTH sides through pandas exactly like the driver does —
    array-typed cells and HUGEINT→float renders fail here, not just there."""
    scols, slines = canon(QUERIES[name](spark, SF_DIR).toPandas())
    dcols, dlines = canon(duck.execute(ORACLES[name]).fetchdf())
    assert len(slines) == len(dlines), (
        f"rowcount spark={len(slines)} duck={len(dlines)}"
    )
    assert scols == dcols
    if table_hash(slines) != table_hash(dlines):
        diff = next((a, b) for a, b in zip(slines, dlines) if a != b)
        raise AssertionError(f"hash mismatch; first diff S={diff[0]!r} D={diff[1]!r}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema == entrymod.entry(spark).schema
