"""Physical-plan assertions: the properties that make these operators hold at
100 TB — pushdown, pruning, broadcast, true top-k, codegen, bounded shuffles.
A change that silently de-optimizes a plan fails here, not on the cluster."""

from __future__ import annotations

import __spark_entry__ as entrymod
from projet_data_engineering_spark.plans.explain import (
    codegen_stage_count,
    has_pushed_filter,
    read_schema_columns,
    shuffle_count,
    uses_broadcast_join,
    uses_take_ordered,
)
from tests.conftest import SF_DIR

Q = entrymod.queries()


def test_isin_filter_pushed_to_scan(spark):
    df = Q["q_filter_isin"](spark, SF_DIR)
    assert has_pushed_filter(df, "o_orderpriority")


def test_range_filter_pushed_to_scan(spark):
    df = Q["q_filter_range"](spark, SF_DIR)
    assert has_pushed_filter(df, "l_quantity")


def test_projection_prunes_scan_columns(spark):
    df = Q["q_project"](spark, SF_DIR)
    cols = read_schema_columns(df, "customer.parquet")
    assert cols == ["c_custkey", "c_name", "c_mktsegment"]


def test_agg_prunes_unused_fact_columns(spark):
    df = Q["q_tpch_q1"](spark, SF_DIR)
    cols = read_schema_columns(df, "lineitem.parquet")
    # 7 columns used; the other 4 (orderkey/partkey/suppkey/linenumber) pruned
    assert set(cols) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }


def test_dim_join_broadcasts(spark):
    assert uses_broadcast_join(Q["q_join_inner"](spark, SF_DIR))
    assert uses_broadcast_join(Q["q_join_multi"](spark, SF_DIR))


def test_topk_avoids_full_sort(spark):
    assert uses_take_ordered(Q["q_topk"](spark, SF_DIR))


def test_flagship_stays_in_codegen(spark):
    assert codegen_stage_count(Q["q_tpch_q1"](spark, SF_DIR)) >= 1


def test_shuffle_budgets(spark):
    # single-agg queries: exactly one exchange (partial+final hash agg)
    assert shuffle_count(Q["q_tpch_q1"](spark, SF_DIR)) <= 1
    assert shuffle_count(Q["q_value_counts"](spark, SF_DIR)) <= 1
    # broadcast dim join + agg: the fact side shuffles once, for the agg only
    assert shuffle_count(Q["q_join_inner"](spark, SF_DIR)) <= 1
    # map-only ETL chains: zero shuffles
    assert shuffle_count(Q["q_duration_parse"](spark, SF_DIR)) == 0
    assert shuffle_count(Q["q_case_when"](spark, SF_DIR)) == 0
    assert shuffle_count(Q["q_should_score"](spark, SF_DIR)) == 0
