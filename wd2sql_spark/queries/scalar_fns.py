"""Scalar-function battery: string / date-time / math / array / map / json.

Everything is a built-in Catalyst expression (JVM-side, whole-stage
codegen) — zero Python UDFs, matching SURVEY §2-C's "UDFs are the slow
path" doctrine. Where Spark and DuckDB return different widths (length →
INT vs BIGINT, date_trunc → TIMESTAMP vs DATE) the Spark side casts so the
driver's schema/value comparison lines up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2sql_spark.catalog import table
from wd2sql_spark.queries.registry import query

STRING_ORACLE = """
SELECT p_partkey,
       lower(p_name)                                   AS name_lc,
       upper(p_brand)                                  AS brand_uc,
       substr(p_type, 1, 6)                            AS type_prefix,
       CAST(length(p_name) AS BIGINT)                  AS name_len,
       concat(p_brand, ':', p_type)                    AS brand_type,
       replace(p_name, ' ', '_')                       AS name_snake,
       trim(concat('  ', p_name, '  '))                AS name_trim,
       lpad(CAST(p_partkey AS VARCHAR), 10, '0')       AS key_padded,
       reverse(p_brand)                                AS brand_rev,
       CAST(strpos(p_name, 'a') AS BIGINT)             AS first_a,
       CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS has_green,
       regexp_replace(p_type, '[aeiou]', '', 'g')      AS type_novowel,
       split_part(p_type, ' ', 1)                      AS type_word1
FROM part
ORDER BY p_partkey
"""


@query("scalar_string_fns", oracle=STRING_ORACLE, category="scalar")
def scalar_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/upper/substring/length/concat/replace/trim/lpad/reverse/
    instr/LIKE/regexp_replace/split_part — the string surface the reference
    uses for English-text selection and comma-stripping (main.rs:193-196),
    widened to the full built-in set."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lc"),
        F.upper("p_brand").alias("brand_uc"),
        F.substring("p_type", 1, 6).alias("type_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace(F.col("p_name"), " ", "_").alias("name_snake"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.instr(F.col("p_name"), "a").cast("bigint").alias("first_a"),
        F.when(F.col("p_name").like("%green%"), 1).otherwise(0).alias("has_green"),
        F.regexp_replace(F.col("p_type"), "[aeiou]", "").alias("type_novowel"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_word1"),
    ).orderBy("p_partkey")


DATE_ORACLE = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT)                    AS order_year,
       CAST(month(o_orderdate) AS BIGINT)                   AS order_month,
       CAST(day(o_orderdate) AS BIGINT)                     AS order_day,
       CAST(dayofweek(o_orderdate) + 1 AS BIGINT)           AS dow,
       CAST(quarter(o_orderdate) AS BIGINT)                 AS qtr,
       CAST(date_trunc('month', o_orderdate) AS DATE)       AS month_start,
       CAST(o_orderdate + INTERVAL 30 DAY AS DATE)          AS due_date,
       date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_epoch_end,
       CAST(epoch(o_orderdate) AS BIGINT)                   AS epoch_s,
       strftime(o_orderdate, '%Y-%m')                       AS ym
FROM orders
ORDER BY o_orderkey
"""


@query("scalar_date_fns", oracle=DATE_ORACLE, category="scalar")
def scalar_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/dayofweek/quarter/date_trunc/date_add/datediff/
    unix_timestamp/date_format — the temporal surface behind the reference's
    time table (value.rs:93-99). DuckDB's dayofweek is 0-based (Sunday=0),
    Spark's is 1-based (Sunday=1) → oracle adds 1."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        F.dayofweek("o_orderdate").cast("bigint").alias("dow"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days_to_epoch_end"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    ).orderBy("o_orderkey")


MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 1)                        AS price_r1,
       abs(l_discount - 0.05)                           AS disc_dev,
       CAST(ceil(l_quantity) AS BIGINT)                 AS qty_ceil,
       CAST(floor(l_quantity) AS BIGINT)                AS qty_floor,
       round(sqrt(l_extendedprice), 4)                  AS price_sqrt,
       round(ln(l_extendedprice + 1), 6)                AS price_ln,
       round(power(1 + l_tax, 2), 6)                    AS tax_sq,
       CAST(l_orderkey % 7 AS BIGINT)                   AS key_mod7,
       CAST(sign(l_discount - 0.05) AS BIGINT)          AS disc_sign,
       greatest(l_quantity, 25.0)                       AS qty_hi,
       least(l_quantity, 25.0)                          AS qty_lo
FROM lineitem
ORDER BY l_orderkey, l_linenumber
"""


@query("scalar_math_fns", oracle=MATH_ORACLE, category="scalar")
def scalar_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/sqrt/ln/pow/mod/sign/greatest/least — the
    arithmetic surface behind id-encoding (id.rs:6-24).

    No final orderBy (r7): the driver's comparison is order-insensitive
    and there is no LIMIT to stabilize, so the global single-exchange
    sort it forced was pure cost (1.5 s of the 2.4 s at sf0.1 — and the
    anti-pattern at 100 TB, where a total order over the fact table
    serializes through one range exchange)."""
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("bigint").alias("disc_sign"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_hi"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("qty_lo"),
    )


ARRAY_ORACLE = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT)            AS n_tokens,
       string_split(text, ' ')[1]                              AS first_token,
       array_to_string(list_sort(list_distinct(string_split(substr(text, 1, 40), ' '))), ',') AS prefix_vocab,
       CAST(list_contains(string_split(text, ' '), 'spark') AS BOOLEAN) AS has_spark,
       array_to_string(list_transform(string_split(substr(text, 1, 20), ' '), x -> upper(x)), ',') AS prefix_uc,
       round(list_aggregate(list_transform(string_split(substr(text, 1, 40), ' '), x -> CAST(length(x) AS DOUBLE)), 'sum'), 1) AS prefix_len_sum
FROM documents
ORDER BY doc_id
"""


@query("scalar_array_fns", oracle=ARRAY_ORACLE, category="scalar")
def scalar_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split/size/element_at/array_distinct+sort/array_contains/transform/
    aggregate — the array surface behind claims flattening (main.rs:86-90).
    `transform`/`aggregate` are Catalyst higher-order functions: they run
    per-row inside codegen, not as UDFs. Array-valued results are
    array_join'd to strings on BOTH sides — the driver's pandas hasher
    cannot factorize list cells (bit this query in r2)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    prefix_toks = F.split(F.substring(F.col("text"), 1, 40), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_join(F.array_sort(F.array_distinct(prefix_toks)), ",").alias("prefix_vocab"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(
            F.transform(F.split(F.substring(F.col("text"), 1, 20), " "), lambda x: F.upper(x)),
            ",",
        ).alias("prefix_uc"),
        F.round(
            F.aggregate(
                prefix_toks,
                F.lit(0.0),
                lambda acc, x: acc + F.length(x).cast("double"),
            ),
            1,
        ).alias("prefix_len_sum"),
    ).orderBy("doc_id")


EXPLODE_ORACLE = """
SELECT token, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
"""


@query("scalar_explode_wordcount", oracle=EXPLODE_ORACLE, category="scalar")
def scalar_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode + groupBy word count — the claims-fan-out shape (2-A#9) on
    text. Generator runs inside codegen; the only shuffle is the count."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


JSON_ORACLE = """
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       round(value, 4) AS value_r
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
ORDER BY event_id
"""


@query("scalar_json_fns", oracle=JSON_ORACLE, category="scalar")
def scalar_json_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object extraction + predicate on the extracted value — the
    JSON surface behind the dump parse (main.rs:198). On the Spark side the
    same could be done with from_json + a declared schema (the ETL path);
    get_json_object is the ad-hoc form."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        e.select(
            "event_id",
            "event_type",
            k.alias("k_val"),
            F.round("value", 4).alias("value_r"),
        )
        .filter(F.col("k_val") > 50)
        .orderBy("event_id")
    )


MAP_ORACLE = """
SELECT doc_id, lang,
       CASE lang WHEN 'en' THEN 'English' WHEN 'fr' THEN 'French'
                 WHEN 'de' THEN 'German'  WHEN 'es' THEN 'Spanish'
                 ELSE NULL END AS lang_name
FROM documents
ORDER BY doc_id
"""


@query("scalar_map_lookup", oracle=MAP_ORACLE, category="scalar")
def scalar_map_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType literal + element_at lookup with null-on-miss — the exact
    semantics of the reference's English-label probe
    (labels.get("en"), main.rs:82-83): 'zh' is deliberately absent from
    the map so it yields NULL, like a missing language key."""
    d = table(spark, sf_dir, "documents")
    lang_map = F.create_map(
        F.lit("en"), F.lit("English"),
        F.lit("fr"), F.lit("French"),
        F.lit("de"), F.lit("German"),
        F.lit("es"), F.lit("Spanish"),
    )
    return d.select(
        "doc_id", "lang", F.element_at(lang_map, F.col("lang")).alias("lang_name")
    ).orderBy("doc_id")


COND_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 200000 THEN 'jumbo'
            WHEN o_totalprice >= 100000 THEN 'large'
            ELSE 'standard' END AS size_class,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_norm,
       round(LEAST(o_totalprice, 250000.0), 2) AS capped,
       GREATEST(CAST(o_orderdate AS TIMESTAMP), TIMESTAMP '1995-01-01') AS date_floor,
       (o_orderpriority = '1-URGENT') AS is_urgent
FROM orders
ORDER BY o_orderkey
"""


@query("scalar_conditional_fns", oracle=COND_ORACLE, category="scalar")
def scalar_conditional_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-expression battery: CASE/when chains, COALESCE, NULLIF,
    LEAST/GREATEST, boolean projection — all whole-stage-codegen'd JVM
    expressions (zero-shuffle narrow plan; the sort is presentation)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 200000, "jumbo")
        .when(F.col("o_totalprice") >= 100000, "large")
        .otherwise("standard")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_norm"
        ),
        F.round(F.least(F.col("o_totalprice"), F.lit(250000.0)), 2).alias("capped"),
        F.greatest(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "date_floor"
        ),
        (F.col("o_orderpriority") == "1-URGENT").alias("is_urgent"),
    ).orderBy("o_orderkey")
