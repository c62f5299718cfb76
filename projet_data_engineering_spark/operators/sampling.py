"""Reproducible corpus sampling + production-scale clustering (round 3).

Training-data pipelines need SAMPLES that are (a) uniform, (b) reproducible
across runs and engines, and (c) cheap at 100 TB. ``rand()``-based sampling
fails (b) — the hash-order trick here is the industry-standard fix: order by
a cryptographic hash of the key and keep the bottom k. Any engine computing
md5 gets the identical sample, and Spark executes it as TakeOrderedAndProject
(per-partition top-k heap + driver merge of k·p rows — no full sort, no
shuffle of the corpus).

Also registers the driver-checkable query for the large-star/small-star
connected-components variant (``dedup.connected_components_lss``) against
the same recursive-closure oracle as the label-propagation version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_data_engineering_spark.io import load_table, spread
from projet_data_engineering_spark.operators.dedup import (
    _clusters_oracle,
    connected_components_lss,
    minhash_candidate_pairs,
)
from projet_data_engineering_spark.registry import query


@query(
    "q_sample_bottomk",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    LIMIT 200
    """,
)
def q_sample_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform sample: bottom-200 documents by md5(doc_id).

    Statistically equivalent to a uniform 200-row sample (a good hash is
    uniform on keys) but exactly reproducible — rerun it next month on the
    grown corpus and previously-sampled docs stay sampled unless pushed out,
    which is what makes eval holdouts and debugging subsets stable. Executes
    as TakeOrderedAndProject; md5 is unique on distinct keys, the extra
    doc_id tie-break just pins determinism for the oracle compare."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .limit(200)
    )


@query("q_dedup_clusters_lss", oracle=_clusters_oracle())
def q_dedup_clusters_lss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash candidate pairs → large-star/small-star connected components.
    Same contract and same DuckDB recursive-CTE oracle as q_dedup_clusters;
    the difference is the round bound — O(log n) rounds vs O(diameter) — so
    this is the variant that survives a path-shaped billion-node component.
    See ``dedup.connected_components_lss``."""
    d = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    pairs = minhash_candidate_pairs(d, "doc_id", "text")
    return connected_components_lss(pairs)
