"""Aggregation battery: hash aggregates, distinct, approx sketches,
rollup/cube/grouping sets.

Spark's groupBy().agg() automatically does partial (map-side) aggregation
before the shuffle — at 100 TB the shuffle moves one row per group per
partition, not the raw data. Nothing here needs a UDAF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wd2sql_spark.catalog import table
from wd2sql_spark.queries.registry import query

PRICING_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(SUM(l_quantity), 2)                                    AS sum_qty,
       round(SUM(l_extendedprice), 2)                               AS sum_base_price,
       ((2 * SUM(CAST(round(l_extendedprice * (1 - l_discount) * 1000000, 0) AS BIGINT)) + 10000) // 20000) / 100.0 AS sum_disc_price,
       ((2 * SUM(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000, 0) AS BIGINT)) + 10000) // 20000) / 100.0 AS sum_charge,
       ((2 * SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) * 100 + COUNT(*)) // (2 * COUNT(*))) / 10000.0      AS avg_qty,
       ((2 * SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) * 100 + COUNT(*)) // (2 * COUNT(*))) / 10000.0 AS avg_price,
       ((2 * SUM(CAST(round(l_discount * 100, 0) AS BIGINT)) * 100 + COUNT(*)) // (2 * COUNT(*))) / 10000.0      AS avg_disc,
       COUNT(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("agg_pricing_summary", oracle=PRICING_ORACLE, category="aggregates", plan_cached=True)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the canonical wide hash-aggregate. One shuffle on the
    2-column group key; partial aggregation collapses each map partition to
    ≤6 rows before it. Product-money sums use the exact integer-units
    pattern and means are rounded in pure integer arithmetic
    (_determinism.exact_avg_at) so both engines agree to the bit even on
    half boundaries; plain 2-decimal sums are boundary-free at round-2 by
    rule 1."""
    from wd2sql_spark.queries._determinism import exact_avg_at, exact_sum_at

    l = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            exact_sum_at(disc_price, 6, 2).alias("sum_disc_price"),
            exact_sum_at(disc_price * (1 + F.col("l_tax")), 6, 2).alias("sum_charge"),
            exact_avg_at(F.col("l_quantity"), 2, 4).alias("avg_qty"),
            exact_avg_at(F.col("l_extendedprice"), 2, 4).alias("avg_price"),
            exact_avg_at(F.col("l_discount"), 2, 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


DISTINCT_ORACLE = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*)                  AS n_orders,
       round(MIN(o_totalprice), 2) AS min_price,
       round(MAX(o_totalprice), 2) AS max_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("agg_count_distinct", oracle=DISTINCT_ORACLE, category="aggregates")
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) alongside plain aggregates — Spark plans this as a
    two-phase expand + aggregate; min/max piggyback on the same shuffle."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


APPROX_DISTINCT_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       'ok' AS approx_verdict
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("agg_approx_count_distinct", oracle=APPROX_DISTINCT_ORACLE, category="aggregates")
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++). DuckDB's HLL is a different
    sketch, so the approximate value itself can never hash-match — instead
    the correctness contract is a deterministic BOUND CHECK: Spark computes
    both the sketch estimate and the exact count and returns
    ``'ok'``/``'off'`` for within-5%-of-exact; the oracle computes the
    exact count and asserts ``'ok'``. A hash match therefore proves the
    sketch landed inside its documented rsd envelope. The scale story is
    unchanged: at 100 TB the approx path shuffles fixed-size sketches
    instead of the distinct-key expand (the exact twin here exists only to
    score the sketch).

    Both aggregates run over ONE deduplicated (flag, orderkey) relation
    (r9; guide §2.3/§2.4 — one scan, no join): HLL register updates are
    idempotent in the inserted value (each distinct key hashes to the same
    register/rank every time, and the merge is a register-wise max), so
    ``approx_count_distinct`` over the distinct pairs is BIT-IDENTICAL to
    running it over the raw multiset, while the exact count becomes a
    plain ``count(*)`` on the same relation — no distinct-Expand, no
    second lineitem scan, no join. The r7 form ran the two arms as
    separate relations joined at the end (itself a fix for the 7.4 s
    one-agg-with-Expand form); this drops its second scan + broadcast
    join + one fact-sized shuffle: plan 4 Exchange + 1 BroadcastExchange
    → 2 Exchange (the post-dedup re-agg by flag and the output sort).

    The sketch is sized to its verdict bound (r9): rsd 0.01 makes
    Spark's HLL++ declare ~1,536 separate LONG buffer attributes (the
    register words are buffer COLUMNS — measured 1.23 s for the HLL
    aggregate alone at sf0.1 vs 0.41 s at the 0.05 default, the whole
    cost being the 1.5k-column partial rows), while the contract only
    asserts within-5%-of-exact. rsd 0.02 puts 5% at 2.5σ with a quarter
    of the buffer; the estimate is deterministic (fixed hash), and the
    relative error was checked at 0.45-3.3% across all three SFs.
    Together: 1.46 → 1.14 s warm quiet-host min (driver-bench 1.52)."""
    l = table(spark, sf_dir, "lineitem")
    dedup = l.select("l_returnflag", "l_orderkey").distinct()
    return (
        dedup.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("exact_orders"),
            F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        )
        .select(
            "l_returnflag",
            "exact_orders",
            F.when(
                F.abs(F.col("approx_orders") - F.col("exact_orders"))
                / F.col("exact_orders")
                <= 0.05,
                "ok",
            )
            .otherwise("off")
            .alias("approx_verdict"),
        )
        .orderBy("l_returnflag")
    )


HLL_ROLLUP_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       'ok' AS sketch_verdict
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("agg_hll_sketch_rollup", oracle=HLL_ROLLUP_ORACLE, category="aggregates")
def agg_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE sketch rollup — the pre-aggregated distinct-count pattern
    every 100 TB metrics store runs: build one HLL sketch (Apache
    DataSketches, ``hll_sketch_agg``, lgK=12 ≈ 2 KB) per fine-grained
    (day, event_type) cell ONCE, persist the cell table, then answer any
    coarser rollup — here per-type across all days — by UNIONING the
    fixed-size sketches (``hll_union_agg``), never rescanning the raw
    events. The raw-data pass shuffles ~|cells| 2 KB sketches instead of
    the distinct-key expand; every later rollup touches only the cell
    table. Contract: DuckDB's HLL is a different sketch, so (same as
    agg_approx_count_distinct) the estimate is scored, not emitted — the
    exact twin and the exact merged-cell count hash-match, and the
    'ok' verdict proves the merged estimate landed within 5% of exact."""
    e = table(spark, sf_dir, "events")
    cells = (
        e.select("event_type", F.to_date("ts").alias("day"), "user_id")
        .groupBy("event_type", "day")
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    )
    rolled = cells.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_users")
    )
    return (
        rolled.join(exact, "event_type")
        .select(
            "event_type",
            "n_days",
            "exact_users",
            F.when(
                F.abs(F.col("est_users") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.05,
                "ok",
            )
            .otherwise("off")
            .alias("sketch_verdict"),
        )
        .orderBy("event_type")
    )


APPROX_PCTL_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       'ok' AS p50_verdict,
       'ok' AS p90_verdict
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("agg_approx_percentiles", oracle=APPROX_PCTL_ORACLE, category="aggregates")
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna sketch) scored against the exact
    percentile, same bound-check contract as agg_approx_count_distinct:
    Spark computes the sketch p50/p90 AND the exact interpolated
    percentile and returns within-5% verdicts; the oracle asserts 'ok'.
    The sketch is the scale path — fixed-size summaries merge map-side
    instead of sorting the column; the exact twin exists to score it."""
    o = table(spark, sf_dir, "orders")
    ap = F.percentile_approx("o_totalprice", [0.5, 0.9], 10_000)
    ex = F.percentile("o_totalprice", [0.5, 0.9])

    def verdict(i: int):
        rel = F.abs(ap[i] - ex[i]) / ex[i]
        return F.when(rel <= 0.05, "ok").otherwise("off")

    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            verdict(0).alias("p50_verdict"),
            verdict(1).alias("p90_verdict"),
        )
        .orderBy("o_orderpriority")
    )


ROLLUP_ORACLE = """
SELECT n_name, c_mktsegment,
       COUNT(*) AS n_custs,
       round(SUM(c_acctbal), 2) AS total_bal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY ROLLUP (n_name, c_mktsegment)
ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST
"""


@query("agg_rollup", oracle=ROLLUP_ORACLE, category="aggregates")
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (nation → segment → grand total)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .rollup("n_name", "c_mktsegment")
        .agg(F.count("*").alias("n_custs"), F.round(F.sum("c_acctbal"), 2).alias("total_bal"))
        .orderBy(F.col("n_name").asc_nulls_first(), F.col("c_mktsegment").asc_nulls_first())
    )


CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@query("agg_cube", oracle=CUBE_ORACLE, category="aggregates")
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dims: all 4 grouping combinations in
    one pass (Expand operator, one shuffle)."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_lines"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


HAVING_ORACLE = """
SELECT o_custkey, COUNT(*) AS n_orders, round(SUM(o_totalprice), 2) AS spend
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 15
ORDER BY spend DESC, o_custkey
"""


@query("agg_having", oracle=HAVING_ORACLE, category="aggregates")
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("spend"))
        .filter(F.col("n_orders") >= 15)
        .orderBy(F.col("spend").desc(), "o_custkey")
    )


GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@query("agg_grouping_sets", oracle=GROUPING_SETS_ORACLE, category="aggregates")
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (DataFrame API exposes only
    rollup/cube; SQL covers arbitrary sets)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


MINMAX_BY_ORACLE = """
WITH ranked AS (
  SELECT c_nationkey, c_name, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey DESC) AS rmax,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal ASC, c_custkey ASC) AS rmin
  FROM customer)
SELECT c_nationkey,
       MAX(CASE WHEN rmax = 1 THEN c_name END) AS richest,
       MAX(CASE WHEN rmin = 1 THEN c_name END) AS poorest,
       round(MAX(c_acctbal), 2) AS max_bal,
       round(MIN(c_acctbal), 2) AS min_bal
FROM ranked
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@query("agg_min_max_by", oracle=MINMAX_BY_ORACLE, category="aggregates")
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin) aggregates: the per-group row lookup
    that otherwise costs a self-join or window — here one hash aggregate.
    The ordering value is (acctbal, custkey) so ties are deterministic in
    both engines (bare max_by on a tied column is engine-arbitrary)."""
    c = table(spark, sf_dir, "customer")
    ordv = F.struct(F.col("c_acctbal"), F.col("c_custkey").cast("double"))
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.max_by(F.col("c_name"), ordv).alias("richest"),
            F.min_by(F.col("c_name"), ordv).alias("poorest"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        )
        .orderBy("c_nationkey")
    )


STATS_MOMENTS_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS sx,
         SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)
             * CAST(round(l_quantity * 100, 0) AS BIGINT)) AS sxx,
         SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sy,
         SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
             * CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS syy,
         SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)
             * CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sxy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round(sqrt(CAST(n * sxx - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))) / 100.0, 4)
         AS stddev_qty,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6)
         AS corr_qty_price
FROM m
ORDER BY l_returnflag
"""


@query("agg_stats_moments", oracle=STATS_MOMENTS_ORACLE, category="aggregates")
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev and Pearson correlation, computed DETERMINISTICALLY:
    the built-in stddev/corr merge partial double states in partition
    order, so two engines (or two runs at different parallelism) disagree
    in the last bits — un-oracle-able. Instead: exact integer moment sums
    (values scaled to 10^-2 units, accumulated in decimal(38,0) — at
    100 TB the squared sums pass int64, ~10^30 ≪ 10^38) and the closed
    forms  var = (nΣx²−(Σx)²)/(n(n−1)),  corr = (nΣxy−ΣxΣy)/√(…·…).
    The moments are a single partial+final hash agg (one shuffle); the
    final double ops run on identical integers in both engines, hence
    identical IEEE results."""
    qty = F.round(F.col("l_quantity") * 100, 0).cast("long")
    price = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec(qty)).alias("sx"),
            F.sum(dec(qty * qty)).alias("sxx"),
            F.sum(dec(price)).alias("sy"),
            F.sum(dec(price * price)).alias("syy"),
            F.sum(dec(qty * price)).alias("sxy"),
        )
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy"))
    varnum_x = (n * sxx - sx * sx).cast("double")
    varnum_y = (n * syy - sy * sy).cast("double")
    return m.select(
        "l_returnflag",
        "n",
        F.round(F.sqrt(varnum_x / (n.cast("double") * (n - 1))) / 100.0, 4).alias("stddev_qty"),
        F.round((n * sxy - sx * sy).cast("double") / F.sqrt(varnum_x * varnum_y), 6).alias(
            "corr_qty_price"
        ),
    ).orderBy("l_returnflag")


HISTOGRAM_ORACLE = """
WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders),
bucketed AS (
  SELECT least(CAST(floor((o_totalprice - b.lo) / ((b.hi - b.lo) / 10.0)) AS BIGINT), 9)
           AS bucket,
         o_totalprice
  FROM orders, b
)
SELECT bucket,
       COUNT(*) AS n_orders,
       round(min(o_totalprice), 2) AS lo_price,
       round(max(o_totalprice), 2) AS hi_price
FROM bucketed
GROUP BY bucket
ORDER BY bucket
"""


@query("agg_histogram_totalprice", oracle=HISTOGRAM_ORACLE, category="aggregates")
def agg_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-bucket equi-width histogram of order totals. The [min, max]
    bounds are a 1-row aggregate broadcast-crossed onto the fact, the
    bucket id is explicit floor arithmetic (identical IEEE ops in both
    engines — width_bucket's edge conventions differ between engines, so
    we don't use it), and the histogram itself is a partial+final count
    on an 10-key space — the shuffle moves ~10 rows per partition at any
    scale."""
    o = table(spark, sf_dir, "orders")
    b = F.broadcast(o.agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")))
    bucket = F.least(
        F.floor((F.col("o_totalprice") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 10.0)),
        F.lit(9),
    ).cast("bigint")
    return (
        o.crossJoin(b)
        .select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo_price"),
            F.round(F.max("o_totalprice"), 2).alias("hi_price"),
        )
        .orderBy("bucket")
    )


ARRAY_AGG_ORACLE = """
SELECT c_nationkey,
       array_to_string((list(c_name ORDER BY c_acctbal DESC, c_custkey))[1:3], '|')
         AS top_names
FROM customer
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@query("agg_ordered_array_topn", oracle=ARRAY_AGG_ORACLE, category="aggregates")
def agg_ordered_array_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-result construction: per nation, the ORDERED list of its
    top-3 customer names by balance. Spark's collect_list is
    order-nondeterministic under parallelism, so the portable idiom is
    pre-rank with row_number (fixing membership AND order), collect
    (rank, name) structs, array_sort on the rank, then project the names
    — every step deterministic. The window and the aggregate share the
    nationkey exchange; collect_list only ever sees ≤3 rows per group, so
    the nested payload stays bounded at any scale. The ordered list is
    projected to a '|'-joined string on BOTH sides because the driver's
    pandas hasher cannot factorize list-valued cells (round-1 `err`)."""
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    c = table(spark, sf_dir, "customer")
    top = c.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    return (
        top.groupBy("c_nationkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "c_name"))),
                    lambda x: x["c_name"],
                ),
                "|",
            ).alias("top_names")
        )
        .orderBy("c_nationkey")
    )


CUSTDIST_ORACLE = """
WITH c_orders AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("agg_customer_order_distribution", oracle=CUSTDIST_ORACLE, category="aggregates")
def agg_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: count-of-counts distribution — how many customers
    placed k qualifying orders, including k=0 (the outer join keeps
    order-less customers; the priority predicate lives IN the join
    condition, not a post-filter, or the k=0 class would vanish).

    Scale shape: one shuffle on custkey shared by the outer join and the
    per-customer count (partial+final agg), then a second ~|distinct k|-row
    aggregate — trivially small. No fact is scanned twice."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (o["o_orderpriority"] != "4-NOT SPECIFIED"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


PROMO_ORACLE = """
SELECT round(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                  THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000, 0) AS BIGINT)
                  ELSE 0 END) AS DOUBLE)
             / SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000, 0) AS BIGINT)),
             6) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-07-01'
  AND l.l_shipdate <  TIMESTAMP '1997-10-01'
"""


@query("agg_promo_revenue_ratio", oracle=PROMO_ORACLE, category="aggregates")
def agg_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue as a percentage of total revenue in
    a ship-date window — a conditional-sum ratio collapsing to ONE row.

    Scale shape: the date filter pushes to the lineitem scan; part (key +
    type only) broadcasts; the global aggregate is partial per partition
    then a 1-row final — no keyed shuffle at all. Both conditional and
    total sums use identical integer revenue units, so the ratio divides
    bit-identical operands in both engines (window_revenue_share idiom)."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev_units = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1_000_000), 0
    ).cast("long")
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .select(
            F.when(F.col("p_type") == "PROMO", rev_units).otherwise(F.lit(0)).alias("pu"),
            rev_units.alias("ru"),
        )
        .agg(
            F.round(
                F.lit(100.0) * F.sum("pu").cast("double") / F.sum("ru"), 6
            ).alias("promo_revenue_pct")
        )
    )
