"""Join battery: every join type, with the physical strategy each deserves.

Scale doctrine (SURVEY §2-C "joins"): dims (region/nation/supplier/part at
TPC-H-ish ratios) are broadcast — zero shuffle of the fact side; fact-fact
joins (orders⋈lineitem) shuffle on the join key and should land as
sort-merge with AQE free to pick shuffled-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2sql_spark.catalog import table
from wd2sql_spark.queries._determinism import exact_sum_at
from wd2sql_spark.queries.registry import query

INNER_ORACLE = """
SELECT n.n_name, c.c_custkey, c.c_name
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY c.c_custkey
"""


@query("join_inner_broadcast", oracle=INNER_ORACLE, category="joins")
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact→dim; dim is broadcast so the customer side never
    shuffles (BroadcastHashJoin in .explain)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"], "inner")
        .select("n_name", "c_custkey", "c_name")
        .orderBy("c_custkey")
    )


LEFT_ORACLE = """
SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS totalprice
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'P'
ORDER BY c.c_custkey, o.o_orderkey
"""


@query("join_left_outer", oracle=LEFT_ORACLE, category="joins")
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with a pre-join filter on the right side (pushed below the
    join, not applied post-join — outer-join semantics preserved)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .select("c_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
        .orderBy("c_custkey", "o_orderkey")
    )


FULL_ORACLE = """
WITH cust_nations AS (SELECT DISTINCT c_nationkey FROM customer WHERE c_acctbal > 9000),
     supp_nations AS (SELECT DISTINCT s_nationkey FROM supplier)
SELECT c_nationkey, s_nationkey
FROM cust_nations FULL OUTER JOIN supp_nations ON c_nationkey = s_nationkey
ORDER BY c_nationkey NULLS FIRST, s_nationkey NULLS FIRST
"""


@query("join_full_outer", oracle=FULL_ORACLE, category="joins")
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two distinct key sets (nulls on both sides)."""
    cn = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_nationkey")
        .distinct()
    )
    sn = table(spark, sf_dir, "supplier").select("s_nationkey").distinct()
    return (
        cn.join(sn, cn["c_nationkey"] == sn["s_nationkey"], "full_outer")
        .select("c_nationkey", "s_nationkey")
        .orderBy(F.col("c_nationkey").asc_nulls_first(), F.col("s_nationkey").asc_nulls_first())
    )


ANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
"""


@query("join_anti_customers_without_orders", oracle=ANTI_ORACLE, category="joins")
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders (NOT EXISTS rewrite)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


SEMI_ORACLE = """
SELECT s_suppkey, s_name
FROM supplier s
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45.0)
ORDER BY s_suppkey
"""


@query("join_semi_suppliers_with_bulk_lines", oracle=SEMI_ORACLE, category="joins")
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: EXISTS over the fact table. The lineitem side is
    filtered and projected to one column before the join, so the shuffle
    (if any — supplier is small enough to broadcast the OTHER way) moves
    minimal bytes."""
    s = table(spark, sf_dir, "supplier")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45.0).select("l_suppkey")
    return (
        s.join(l, s["s_suppkey"] == l["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


CROSS_ORACLE = """
SELECT r.r_name, t.o_orderstatus
FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) t
ORDER BY r_name, o_orderstatus
"""


@query("join_cross_small", oracle=CROSS_ORACLE, category="joins")
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two tiny inputs (both < broadcast threshold →
    BroadcastNestedLoopJoin; never do this between two facts)."""
    r = table(spark, sf_dir, "region").select("r_name")
    st = table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(st).orderBy("r_name", "o_orderstatus")


SALTED_ORACLE = """
SELECT o.o_orderpriority,
       COUNT(*) AS n_lines,
       ((2 * SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000, 0) AS BIGINT)) + 10000) // 20000) / 100.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@query("join_skew_salted", oracle=SALTED_ORACLE, category="joins")
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join executed through manual key salting (operators/
    skew.py): lineitem's shuffle key becomes (l_orderkey, salt) so a
    pathological hot key spreads over 8 reducers; orders is replicated
    8×. Salting preserves join semantics exactly — the oracle is the
    plain unsalted join."""
    from wd2sql_spark.operators.skew import salted_join

    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        l, o, l["l_orderkey"] == o["o_orderkey"], salt_src="l_linenumber", n_salts=8
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            exact_sum_at(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6, 2).alias(
                "revenue"
            ),
        )
        .orderBy("o_orderpriority")
    )


MULTIWAY_ORACLE = """
SELECT n.n_name,
       ((2 * SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000, 0) AS BIGINT)) + 10000) // 20000) / 100.0 AS revenue
FROM customer c
JOIN orders o    ON c.c_custkey = o.o_custkey
JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n    ON s.s_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
"""


@query("join_multiway_local_supplier_volume", oracle=MULTIWAY_ORACLE, category="joins", plan_cached=True)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join. region/nation/supplier broadcast;
    orders⋈lineitem is the one genuine shuffle. The date filter on orders
    is applied before the join so pushdown prunes the fact scan.

    The ``c_nationkey = s_nationkey`` condition implies customers outside
    EUROPE nations can never survive — but Catalyst can't derive that
    transitively, so we pre-filter customer with a broadcast semi-join
    against EUROPE nations. At scale this shrinks the customer⋈orders
    shuffle by ~the regional selectivity (1/5 here) for free (no extra
    shuffle: the semi-join side is a broadcast)."""
    # The pre-filter reuses the (session-cached) nation/region scans the
    # main join also reads, so BOTH sides rename their columns — fresh
    # exprIds sidestep self-join column ambiguity; both are tiny dims.
    pre_n = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("eu_nationkey"), F.col("n_regionkey").alias("eu_regionkey")
    )
    pre_r = (
        table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "EUROPE")
        .select(F.col("r_regionkey").alias("eu_rkey"))
    )
    eu_keys = pre_n.join(
        F.broadcast(pre_r), pre_n["eu_regionkey"] == F.col("eu_rkey"), "left_semi"
    ).select("eu_nationkey")
    c = table(spark, sf_dir, "customer").join(
        F.broadcast(eu_keys), F.col("c_nationkey") == F.col("eu_nationkey"), "left_semi"
    )
    # Main-join copies of the twice-scanned dims rename EVERY column
    # (Spark's ambiguous-self-join check looks at scan attributes, not
    # just projected outputs, so unaliased refs into a shared scan fail).
    n = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nn_key"),
        F.col("n_regionkey").alias("nn_rkey"),
        F.col("n_name").alias("nation_name"),
    )
    r = (
        table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "EUROPE")
        .select(F.col("r_regionkey").alias("rr_key"))
    )
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .join(
            F.broadcast(s),
            (l["l_suppkey"] == s["s_suppkey"]) & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == F.col("nn_key"))
        .join(F.broadcast(r), F.col("nn_rkey") == F.col("rr_key"))
        .groupBy(F.col("nation_name").alias("n_name"))
        .agg(
            # exact integer-units sum (see queries/_determinism.py): a plain
            # double SUM is order-sensitive and flips round-2 boundaries
            # between engines.
            exact_sum_at(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6, 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


SHIP_PRIORITY_ORACLE = """
SELECT l.l_orderkey,
       ((2 * SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000, 0) AS BIGINT)) + 10000) // 20000) / 100.0 AS revenue,
       o.o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate  > TIMESTAMP '1998-06-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("join_shipping_priority_topk", oracle=SHIP_PRIORITY_ORACLE, category="joins")
def join_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue ranking. Both date filters
    and the segment filter are applied on the base scans so they push into
    parquet; the orderkey-grouped aggregate reuses the orders⋈lineitem
    shuffle partitioning (l_orderkey ⊆ group keys after the equi-join),
    and the global top-10 is TakeOrderedAndProject — per-partition top-10
    then a 10-row merge at the driver, never a full sort, the only sane
    shape at 100 TB. Tiebreak on l_orderkey makes the selected 10 rows a
    deterministic set for the oracle hash."""
    cutoff = F.lit("1998-06-01").cast("timestamp")
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            exact_sum_at(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6, 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


RETURNED_ITEM_ORACLE = """
SELECT c.c_custkey, c.c_name,
       ((2 * SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000, 0) AS BIGINT)) + 10000) // 20000) / 100.0 AS revenue,
       n.n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("join_returned_item_ranking", oracle=RETURNED_ITEM_ORACLE, category="joins")
def join_returned_item_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers who returned the most revenue in a
    quarter-ish window. nation broadcasts onto customer; the quarter
    filter prunes the orders scan and the returnflag filter prunes
    lineitem BEFORE the fact⋈fact shuffle; the customer-grouped aggregate
    then the global top-20 via TakeOrderedAndProject (no full sort)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            exact_sum_at(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6, 2).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


DISJUNCTIVE_ORACLE = """
SELECT ((2 * SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000, 0) AS BIGINT)) + 10000) // 20000) / 100.0 AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1  AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
"""


@query("join_disjunctive_predicate", oracle=DISJUNCTIVE_ORACLE, category="joins")
def join_disjunctive_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides.

    The disjunction itself can only be evaluated after the join, but each
    side's HULL of the disjunction (the union of that side's ranges) is a
    conjunctive filter we apply on the base scans: part shrinks to 3
    brands × size≤15 (making its broadcast scale-safe — the filtered dim
    is a tiny fraction of part regardless of SF), and lineitem prunes to
    quantity≤30 before any join. Catalyst won't always derive these hulls
    from the OR, so we state them; the residual OR runs post-join on the
    surviving rows only."""
    branches = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))
        .filter(F.col("p_size").between(1, 15))
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity").between(1, 30))
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .filter(branches)
        .agg(
            exact_sum_at(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6, 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


COOCCURRENCE_ORACLE = """
WITH pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_orders
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY p1, p2
)
SELECT p1, p2, n_orders
FROM pairs
ORDER BY n_orders DESC, p1, p2
LIMIT 20
"""


@query("join_basket_cooccurrence", oracle=COOCCURRENCE_ORACLE, category="joins")
def join_basket_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing in the same
    order, top-20 by support — the recommendation/co-view shape.

    ONE scan, ONE shuffle (r6): collect each order's basket as a sorted
    array, then generate the C(k,2) pairs ROW-LOCALLY from the array —
    bounded because basket size k is bounded (TPC-H ≤ 7 lines/order; at
    100 TB a real pipeline caps k with a per-order limit before pairing,
    same plan). The r5 self-join form scanned lineitem twice and
    shuffled both sides into a join; the array form emits the identical
    pair multiset (sorted array + strictly-later slice ≡ the join's
    p1 < p2 on line pairs, duplicate parts included) for half the scan
    and exchange volume — 1.97 → 1.58 s warm at sf0.1 (r6); the r5 form
    re-measured 2.25-2.82 s this round, so the array form still wins.
    Since r9 the basket build is repartition-FIRST: `collect_list` plans
    as ObjectHashAggregate (object-based, no codegen), and the r6 form
    paid it TWICE — partial buffers built map-side, serialized through
    the exchange, merged on the reduce side. Shuffling the raw narrow
    (orderkey, partkey) rows by `l_orderkey` first makes the basket
    aggregate a single partition-local pass with no list-buffer
    serialization at all: interleaved A/B min 1.66 → 1.24 s at sf0.1
    (guide §1.2 per-task work / §2.3 what the exchange carries — same
    class as the Q21 collect_set fix). The residual is the C(k,2)
    explode + the (p1, p2) pair aggregate, both inherent to the answer.
    Pair counting is partial+final agg; top-20 is TakeOrderedAndProject
    with (p1, p2) tiebreaks for a deterministic set."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = (
        li.repartition("l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list("l_partkey")).alias("arr"))
    )
    arr = F.col("arr")
    pair_structs = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.size(arr)),
                lambda y: F.struct(x.alias("p1"), y.alias("p2")),
            ),
        )
    )
    return (
        baskets.select(F.explode(pair_structs).alias("pr"))
        .filter(F.col("pr.p1") < F.col("pr.p2"))
        .select(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "p1", "p2")
        .limit(20)
    )


NATION_PAIR_ORACLE = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       ((2 * SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000, 0) AS BIGINT)) + 10000) // 20000) / 100.0 AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
ORDER BY supp_nation, cust_nation, l_year
"""


@query("join_nation_pair_volume", oracle=NATION_PAIR_ORACLE, category="joins")
def join_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year. The nation-pair disjunction spans both join sides, so neither
    filter alone can be pushed into the fact — but each side's CNF hull
    (supplier nation ∈ {A,B}, customer nation ∈ {A,B}) CAN: both dim
    chains (supplier⋈nation, customer⋈nation) pre-reduce to the two
    nations and BROADCAST onto the facts, shrinking the one genuine
    shuffle (lineitem⋈orders) to ~(2/|nations|)² of the data before the
    full disjunction is applied post-join. Revenue uses the exact
    integer-units money sum (queries/_determinism.py)."""
    pair = ("NATION_1", "NATION_2")
    n1 = table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    n2 = table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    s2 = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c2 = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .select("c_custkey", "cust_nation")
    )
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    return (
        l.join(F.broadcast(s2), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c2), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate")).cast("int").alias("l_year"),
        )
        .agg(
            exact_sum_at(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6, 2).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


MARKET_SHARE_ORACLE = """
WITH flat AS (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000, 0) AS BIGINT) AS rev_units,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'ASIA'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
)
SELECT o_year,
       round(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev_units ELSE 0 END) AS DOUBLE)
             / SUM(rev_units), 6) AS mkt_share
FROM flat
GROUP BY o_year
ORDER BY o_year
"""


@query("join_market_share", oracle=MARKET_SHARE_ORACLE, category="joins", plan_cached=True)
def join_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue sold into
    ASIA customers, by order year. The tiny dim chains (part-type filter,
    supplier→nation tag, nation⋈region) pre-reduce and BROADCAST; the
    ASIA-customer key set is customer-sized, so it is a left-SEMI join the
    optimizer is free to execute as shuffle or (at small SF, via AQE)
    broadcast — never a forced broadcast of a fact-scaled relation. The
    genuine shuffles are lineitem⋈orders and the semi-join, both pre-pruned
    by the pushed part filter. The share is a conditional-sum ratio over
    the SAME integer revenue units in both engines (window_revenue_share
    idiom), so the division and 6-decimal round see bit-identical
    operands."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    asia = (
        table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    cust_asia = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(asia), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    supp_n = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    rev_units = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1_000_000), 0
    ).cast("long")
    flat = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(cust_asia, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_n), l["l_suppkey"] == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            rev_units.alias("rev_units"),
            "supp_nation",
        )
    )
    return (
        flat.groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("rev_units")).otherwise(
                    F.lit(0)
                )
            ).alias("nation_units"),
            F.sum("rev_units").alias("all_units"),
        )
        .select(
            "o_year",
            F.round(
                F.col("nation_units").cast("double") / F.col("all_units"), 6
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


PROFIT_ORACLE = """
SELECT sn.n_name AS nation,
       CAST(year(o.o_orderdate) AS INT) AS o_year,
       (SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000, 0) AS BIGINT))
        - SUM(CAST(round(p.p_retailprice * l.l_quantity * 0.1 * 1000000, 0) AS BIGINT)))
       / 1000000.0 AS profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
GROUP BY nation, o_year
ORDER BY nation, o_year
"""


@query("join_profit_by_nation_year", oracle=PROFIT_ORACLE, category="joins")
def join_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'widget' parts by supplier nation and
    order year, with a 10%-of-retail cost proxy standing in for
    ps_supplycost (the fixtures carry no partsupp table). part (LIKE
    filter applied BEFORE the join) and supplier⋈nation broadcast; the one
    genuine shuffle is lineitem⋈orders, pre-pruned by the part semi-join.

    Determinism: per-line profit can be negative, and integer `div`
    truncation differs from floor there — so instead of rounding a signed
    sum, revenue and cost are summed as separate NON-NEGATIVE integer-unit
    sums and differenced exactly; the single final division by 10^6 is one
    IEEE op on identical integers in both engines (no rounding step at
    all)."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    supp_n = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    rev_units = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.lit(1_000_000), 0
    ).cast("long")
    cost_units = F.round(
        F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1) * F.lit(1_000_000), 0
    ).cast("long")
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(supp_n), l["l_suppkey"] == F.col("s_suppkey"))
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(rev_units).alias("ru"),
            F.sum(cost_units).alias("cu"),
        )
        .select(
            "nation",
            "o_year",
            ((F.col("ru") - F.col("cu")) / F.lit(1_000_000.0)).alias("profit"),
        )
        .orderBy("nation", "o_year")
    )
