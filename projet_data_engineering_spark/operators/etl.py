"""Scalar / ETL functions (SURVEY.md §2.7, F1–F20).

The reference's densest capability area: the scraper's row-at-a-time Python
cleaning logic (``scraper/main.py:139-235``). Every function here compiles to
built-in Column expressions — no UDFs — so the whole chain stays inside
whole-stage codegen and is embarrassingly parallel (zero shuffles).

Driver queries run the same expression shapes over the TPC-H-ish columns so
DuckDB can oracle them; the recipe-shaped chain itself lives in
``recipes/pipeline.py`` and is golden-tested (FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_data_engineering_spark.io import load_table
from projet_data_engineering_spark.registry import query


@query(
    "q_md5_key",
    oracle="SELECT c_custkey, md5(c_name) AS key_md5 FROM customer",
)
def q_md5_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/D2 — content-hash key (reference ``scraper/main.py:139``:
    ``product_id = md5(url)`` for cross-run dedup/upsert)."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.md5("c_name").alias("key_md5")
    )


@query(
    "q_string_clean",
    oracle="""
    SELECT p_partkey, trim(lower(p_name)) AS name_clean,
           upper(p_brand) AS brand_upper
    FROM part
    """,
)
def q_string_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F3 — lower + trim normalization (reference ``scraper/main.py:160``,
    ``app/main.py:107``)."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.trim(F.lower("p_name")).alias("name_clean"),
        F.upper("p_brand").alias("brand_upper"),
    )


@query(
    "q_split",
    oracle="""
    SELECT c_custkey, str_split(c_name, '#')[1] AS name_prefix,
           str_split(c_name, '#')[2] AS name_suffix
    FROM customer
    """,
)
def q_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — split-to-array + element extraction (reference ``app/main.py:107``:
    ``ingredients_input.split(",")``). 1-based ``element_at`` on both sides."""
    c = load_table(spark, sf_dir, "customer")
    parts = F.split(F.col("c_name"), "#")
    return c.select(
        "c_custkey",
        F.element_at(parts, 1).alias("name_prefix"),
        F.element_at(parts, 2).alias("name_suffix"),
    )


@query(
    "q_array_join",
    oracle="""
    SELECT p_partkey,
           array_to_string(str_split(p_name, ' '), '-') AS name_joined
    FROM part
    """,
)
def q_array_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — array join (reference ``scraper/main.py:275-276``:
    ``", ".join(ingredients)`` building the ES text fields)."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.array_join(F.split(F.col("p_name"), " "), "-").alias("name_joined"),
    )


@query(
    "q_contains",
    oracle="""
    SELECT p_partkey, p_name FROM part WHERE contains(p_name, 'widget')
    """,
)
def q_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — substring containment (reference ``scraper/main.py:171-181``:
    ``"très facile" in info``; ES wildcard ``*ing*``)."""
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("widget"))
        .select("p_partkey", "p_name")
    )


@query(
    "q_replace",
    oracle="""
    SELECT c_custkey, replace(c_name, 'Customer#', 'C-') AS short_name
    FROM customer
    """,
)
def q_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — literal replace (reference ``scraper/main.py:186,219``:
    ``.replace("heure", "h")``, ``.replace(",", ".")``)."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.regexp_replace("c_name", "Customer#", "C-").alias("short_name"),
    )


@query(
    "q_duration_parse",
    oracle="""
    WITH raw AS (
        SELECT p_partkey,
               concat(CAST(p_size AS VARCHAR), ' h ',
                      CAST(p_partkey % 60 AS VARCHAR), ' min') AS header_text
        FROM part
    )
    SELECT p_partkey, header_text,
           CASE WHEN regexp_matches(header_text, '[0-9]')
                THEN COALESCE(TRY_CAST(regexp_extract(header_text, '(\\d+)\\s*h', 1) AS INTEGER), 0) * 60
                     + COALESCE(TRY_CAST(regexp_extract(header_text, '(\\d+)\\s*min', 1) AS INTEGER), 0)
                ELSE 0 END AS duration_min
    FROM raw
    """,
)
def q_duration_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/F10/F12/F13 — the reference's duration parser
    (``scraper/main.py:185-205``): regex-extract hours and minutes from free
    text, ``h*60 + min``, digit-presence gate, 0 sentinel on failure.
    Here the header text is synthesized from part columns so the oracle sees
    identical inputs; ``recipes/pipeline.py`` applies the same expression to
    real recipe headers."""
    p = load_table(spark, sf_dir, "part")
    raw = p.select(
        "p_partkey",
        F.concat(
            F.col("p_size").cast("string"),
            F.lit(" h "),
            (F.col("p_partkey") % 60).cast("string"),
            F.lit(" min"),
        ).alias("header_text"),
    )
    hours = F.regexp_extract("header_text", r"(\d+)\s*h", 1)
    mins = F.regexp_extract("header_text", r"(\d+)\s*min", 1)
    duration = F.when(
        F.col("header_text").rlike("[0-9]"),
        F.coalesce(hours.try_cast("int"), F.lit(0)) * 60
        + F.coalesce(mins.try_cast("int"), F.lit(0)),
    ).otherwise(0)
    return raw.select(
        "p_partkey", "header_text", duration.alias("duration_min")
    )


@query(
    "q_regex_first_int",
    oracle="""
    SELECT c_custkey,
           CAST(regexp_extract(c_name, '(\\d+)', 1) AS BIGINT) AS first_int
    FROM customer
    """,
)
def q_regex_first_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 — first-integer extraction (reference ``scraper/main.py:212-213``:
    ``re.findall(r'\\d+', text)[0]`` for reviews_count)."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.regexp_extract("c_name", r"(\d+)", 1).cast("bigint").alias("first_int"),
    )


@query(
    "q_regex_extract_all",
    oracle="""
    SELECT doc_id,
           COALESCE(array_to_string(regexp_extract_all(text, '[0-9]+'), ','),
                    '') AS nums,
           len(regexp_extract_all(text, '[0-9]+')) AS n_nums
    FROM documents
    """,
)
def q_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 generalized — ALL regex matches (the full ``re.findall`` the
    reference truncates to ``[0]``), plus the match count. Codegen'd map
    over the scan; the array stays columnar — no explode needed to count.
    The array is serialized with ``array_join`` so the query's output
    contract stays scalar (pandas-based canonicalizers cannot hash list
    cells)."""
    nums = F.expr("regexp_extract_all(text, '[0-9]+', 0)")
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(nums, ",").alias("nums"),
        F.size(nums).alias("n_nums"),
    )


@query(
    "q_cast_rating",
    oracle="""
    WITH raw AS (
        SELECT o_orderkey,
               concat(CAST(o_orderkey % 5 AS VARCHAR), ',',
                      CAST(o_custkey % 10 AS VARCHAR), '/5') AS rating_text
        FROM orders
    )
    SELECT o_orderkey, rating_text,
           CAST(replace(replace(rating_text, '/5', ''), ',', '.') AS DOUBLE) AS rating
    FROM raw
    """,
)
def q_cast_rating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 — locale-fixed float cast (reference ``scraper/main.py:219``:
    ``float(text.replace(",", "."))`` for '4,8/5'-style ratings)."""
    o = load_table(spark, sf_dir, "orders")
    raw = o.select(
        "o_orderkey",
        F.concat(
            (F.col("o_orderkey") % 5).cast("string"),
            F.lit(","),
            (F.col("o_custkey") % 10).cast("string"),
            F.lit("/5"),
        ).alias("rating_text"),
    )
    rating = F.regexp_replace(
        F.regexp_replace("rating_text", "/5", ""), ",", "."
    ).cast("double")
    return raw.select("o_orderkey", "rating_text", rating.alias("rating"))


@query(
    "q_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN contains(lower(o_orderpriority), 'urgent') THEN 'rush'
                WHEN contains(lower(o_orderpriority), 'high') THEN 'fast'
                WHEN contains(lower(o_orderpriority), 'low') THEN 'slow'
                ELSE 'normal' END AS priority_class
    FROM orders
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14 — order-sensitive conditional cascade (reference
    ``scraper/main.py:167-182``: difficulty normalization where 'très facile'
    must be tested before 'facile'). ``when`` chains short-circuit in order."""
    o = load_table(spark, sf_dir, "orders")
    lo = F.lower("o_orderpriority")
    cls = (
        F.when(lo.contains("urgent"), "rush")
        .when(lo.contains("high"), "fast")
        .when(lo.contains("low"), "slow")
        .otherwise("normal")
    )
    return o.select("o_orderkey", cls.alias("priority_class"))


@query(
    "q_blacklist_default",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_name IS NULL OR p_name = ''
                     OR regexp_matches(lower(p_name), 'widget|gear|cog')
                THEN 'https://images.example.com/placeholder'
                ELSE p_name END AS image_url
    FROM part
    """,
)
def q_blacklist_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 — blacklist→default substitution (reference
    ``scraper/main.py:155-164``: banned image URLs swapped for a placeholder)."""
    p = load_table(spark, sf_dir, "part")
    bad = (
        F.col("p_name").isNull()
        | (F.col("p_name") == "")
        | F.lower("p_name").rlike("widget|gear|cog")
    )
    return p.select(
        "p_partkey",
        F.when(bad, F.lit("https://images.example.com/placeholder"))
        .otherwise(F.col("p_name"))
        .alias("image_url"),
    )


@query(
    "q_substring",
    oracle="SELECT p_partkey, substr(p_name, 1, 5) AS name_head FROM part",
)
def q_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16 — truncate (reference ``scraper/main.py:189,238``: first 1000 chars
    fallback, ``title[:20]``)."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey", F.substring("p_name", 1, 5).alias("name_head")
    )


@query(
    "q_timestamp",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS updated_at,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m
    FROM orders
    """,
)
def q_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 — timestamp formatting (reference ``scraper/main.py:234``:
    ``time.strftime("%Y-%m-%d %H:%M:%S")`` → ``updated_at``) + calendar
    extraction for partition-pruning-friendly derived columns."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("updated_at"),
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
    )


@query(
    "q_concat",
    oracle="""
    SELECT o_orderkey,
           concat('https://www.example.org/search?aqt=', lower(o_orderpriority),
                  '&page=', CAST(o_orderkey % 33 + 1 AS VARCHAR)) AS page_url
    FROM orders
    """,
)
def q_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F18 — URL building by concat (reference ``scraper/main.py:93,113``)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.concat(
            F.lit("https://www.example.org/search?aqt="),
            F.lower("o_orderpriority"),
            F.lit("&page="),
            (F.col("o_orderkey") % 33 + 1).cast("string"),
        ).alias("page_url"),
    )


@query(
    "q_posexplode",
    oracle="""
    SELECT d.doc_id, u.i AS pos, str_split(d.text, ' ')[u.i] AS word
    FROM (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0) d,
         UNNEST(generate_series(1, len(str_split(d.text, ' ')))) AS u(i)
    """,
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F20 — positional explode (reference ``app/main.py:200-201``:
    ``enumerate(steps)`` for 1-based step numbering). posexplode is Spark's
    UDTF-free table generator; positions made 1-based to match SQL."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 50 == 0)
        .select("doc_id", F.split("text", " ").alias("words"))
    )
    return d.select(
        "doc_id", F.posexplode("words").alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")


@query(
    "q_datediff",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           date_diff('day', o.o_orderdate, l.l_shipdate) AS ship_delay_days
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def q_datediff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic — days between order and ship date (extends F17;
    the join shuffles on the shared key once, then pure column math."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("ship_delay_days"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4)
               AS avg_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from a string payload column (``events.props``) —
    the semi-structured sidecar every event pipeline carries. ``get_json_object``
    evaluates JVM-side inside codegen; for hot paths with many keys, parse once
    with ``from_json`` into a struct column instead of N path extractions."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "q_map_enrich",
    oracle="""
    SELECT event_id,
           CASE event_type
               WHEN 'view' THEN 'browse'
               WHEN 'click' THEN 'browse'
               WHEN 'signup' THEN 'convert'
               WHEN 'purchase' THEN 'convert'
               ELSE 'other' END AS category
    FROM events
    """,
)
def q_map_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal-map dimension enrichment: a small static mapping shipped as a
    MAP literal inside the expression — the zero-cost tier below a broadcast
    join (no table, no join operator, no memory beyond the codegen'd
    constant). The right tool whenever the 'dimension' is a config-sized
    lookup; reach for broadcast joins only when the mapping is data."""
    mapping = {
        "view": "browse",
        "click": "browse",
        "signup": "convert",
        "purchase": "convert",
    }
    lit_map = F.create_map(
        *[F.lit(x) for kv in mapping.items() for x in kv]
    )
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(
            F.try_element_at(lit_map, F.col("event_type")), F.lit("other")
        ).alias("category"),
    )


TRACKING_PARAMS = "^(utm_[a-z]+|fbclid|gclid)="


def canonicalize_url(url) -> "F.Column":
    """URL canonicalization — the normalization in front of the reference's
    ``product_id = md5(url)`` document key (``scraper/main.py:139``): two
    spellings of one resource must hash identically or the dedup/upsert key
    silently forks.

    Pure Column algebra (codegen, zero shuffles): lowercase scheme+host,
    drop default ports (80/http, 443/https), strip trailing path slashes
    (bare host -> "/"), drop the fragment, drop tracking query params
    (utm_*/fbclid/gclid), and sort surviving params byte-wise so parameter
    order stops mattering."""
    url = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port != "") & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = F.regexp_replace(
        F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1), r"/+$", ""
    )
    path_part = F.when(path == "", F.lit("/")).otherwise(path)
    # strip the fragment BEFORE extracting the query: a '?' inside the
    # fragment of a query-less URL ('http://h/p#f?x=1') is not a query
    nofrag = F.regexp_replace(url, r"#.*$", "")
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_extract(nofrag, r"\?(.*)$", 1), "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAMS),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        port_part,
        path_part,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


@query(
    "q_url_dedup",
    oracle="""
    WITH gen AS (
        SELECT doc_id,
               CASE doc_id % 4
                 WHEN 0 THEN 'HTTP://WWW.SHOP.COM:80/item/' || (doc_id // 4)
                             || '?utm_source=feed&b=2&a=1#top'
                 WHEN 1 THEN 'http://www.shop.com/item/' || (doc_id // 4)
                             || '/?a=1&b=2'
                 WHEN 2 THEN 'https://CDN.shop.com:8080/item/' ||
                             (doc_id // 4) || '#frag'
                 ELSE 'https://cdn.shop.com:8080/item/' || (doc_id // 4)
                      || '/'
               END AS url
        FROM documents
    ),
    canon AS (
        SELECT doc_id,
               lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
                   AS scheme,
               regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest,
               regexp_extract(regexp_replace(url, '#.*$', ''),
                              '\\?(.*)$', 1) AS query
        FROM gen
    ),
    c2 AS (
        SELECT doc_id, scheme,
               lower(regexp_extract(regexp_extract(rest, '^([^/?#]*)', 1),
                                    '^([^:]*)', 1)) AS host,
               regexp_extract(regexp_extract(rest, '^([^/?#]*)', 1),
                              ':([0-9]+)$', 1) AS port,
               regexp_replace(regexp_extract(rest, '^[^/?#]*([^?#]*)', 1),
                              '/+$', '') AS path,
               array_to_string(
                   list_sort(list_filter(str_split(query, '&'),
                       p -> p <> '' AND NOT regexp_matches(p,
                            '^(utm_[a-z]+|fbclid|gclid)='))), '&') AS qs
        FROM canon
    ),
    final AS (
        SELECT doc_id,
               scheme || '://' || host ||
               CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
                         AND NOT (scheme = 'https' AND port = '443')
                    THEN ':' || port ELSE '' END ||
               CASE WHEN path = '' THEN '/' ELSE path END ||
               CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canonical
        FROM c2
    )
    SELECT canonical, md5(canonical) AS url_key,
           COUNT(*) AS n_copies, MIN(doc_id) AS keeper
    FROM final
    GROUP BY canonical
    HAVING COUNT(*) > 1
    """,
)
def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-keyed dedup end-to-end (reference D2: ``product_id = md5(url)``).
    Four messy spellings of each resource are synthesized JVM-side —
    uppercase host + default port + tracking params + fragment, trailing
    slash + shuffled params, explicit non-default port, casing variants —
    then canonicalized and grouped on the md5 of the canonical form. Every
    surviving group proves the normalizer collapsed spellings the raw
    string would have forked; the oracle re-derives the same canonical form
    independently in DuckDB. Map-only until the single dedup groupBy."""
    d = load_table(spark, sf_dir, "documents")
    item = F.expr("doc_id div 4").cast("string")
    v = F.col("doc_id") % 4
    url = (
        F.when(
            v == 0,
            F.concat(
                F.lit("HTTP://WWW.SHOP.COM:80/item/"), item,
                F.lit("?utm_source=feed&b=2&a=1#top"),
            ),
        )
        .when(
            v == 1,
            F.concat(
                F.lit("http://www.shop.com/item/"), item,
                F.lit("/?a=1&b=2"),
            ),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("https://CDN.shop.com:8080/item/"), item,
                F.lit("#frag"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://cdn.shop.com:8080/item/"), item, F.lit("/"))
        )
    )
    canon = d.select("doc_id", canonicalize_url(url).alias("canonical"))
    return (
        canon.groupBy("canonical")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_copies") > 1)
        .select(
            "canonical",
            F.md5("canonical").alias("url_key"),
            "n_copies",
            "keeper",
        )
    )
