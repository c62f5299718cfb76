"""projet_data_engineering_spark — a PySpark-native analytics engine.

Brand-new implementation of the query and data-processing capabilities of the
reference repo ``william-zee/Projet_Data_Engineering`` (a MongoDB + Elasticsearch
+ pandas recipe-analytics stack), re-expressed Spark-first:

- every operator is a pure ``DataFrame -> DataFrame`` function built from
  Catalyst-visible built-ins (``pyspark.sql.functions``), so predicate pushdown,
  column pruning, join planning and whole-stage codegen come for free;
- the Elasticsearch full-text surface (fuzzy match, bool/should scoring, BM25
  top-k) is re-derived as DataFrame algebra (see ``operators/search.py``);
- the MongoDB upsert/aggregation surface maps to joins + hash aggregations
  (see ``operators/relational.py`` and ``operators/etl.py``);
- beyond the reference, large-scale training-data-pipeline operators are
  first-class: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  embedding-cosine), similarity search, text analysis, multimodal plumbing.

Designed for a multi-executor cluster at ~100 TB: no driver-side collects in
any operator, broadcast joins for small dimensions, map-side partial
aggregation, and explicit partitioning notes per operator.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
