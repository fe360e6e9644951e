"""Relational operator surface (SURVEY §2.1–§2.7) over the TPC-H-ish
driver tables. Declarative DataFrame plans — Catalyst handles predicate
pushdown, column pruning, and join strategy; small dimensions are
explicitly broadcast (the reference's pandas-probe joins were in-memory
hash probes, §2.3 J2–J5).

Aggregate doubles are rounded on BOTH the Spark and DuckDB side so the
driver's value-hash compares stably.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_kafka_project_spark.ops import load


# ---------- scans + aggregation (partial/final agg from Catalyst) ----------

def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1-shaped scan+agg: grouped sums over lineitem."""
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                          AS sum_qty,
       round(sum(l_extendedprice), 2)                     AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
       count(*)                                           AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """3-way join + filter + grouped revenue + deterministic top-10."""
    c = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )
    return rev.orderBy(F.desc("revenue"), "o_orderkey").limit(10)


Q3_SQL = """
SELECT o_orderkey, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way join: revenue per nation where the customer
    and supplier share the nation; dims broadcast."""
    r = F.broadcast(load(spark, sf, "region"))
    n = F.broadcast(load(spark, sf, "nation"))
    s = F.broadcast(load(spark, sf, "supplier"))
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


Q5_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name
"""


def region_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Broadcast-chain dim join: orders rolled up to region."""
    r = F.broadcast(load(spark, sf, "region"))
    n = F.broadcast(load(spark, sf, "nation"))
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


REGION_ROLLUP_SQL = """
SELECT r_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# ---------- window / sort / limit ----------

def window_top3_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Ranking window: top-3 orders per customer by price (total order)."""
    o = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rk")
    )


WINDOW_TOP3_SQL = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
)
WHERE rk <= 3
"""


def pagination_page(spark: SparkSession, sf: str) -> DataFrame:
    """LIMIT offset,limit pagination with a total order — the reference
    search pagination (redis_interface.py:101,107)."""
    o = load(spark, sf, "orders")
    return (
        o.orderBy("o_orderdate", "o_orderkey")
        .offset(10)
        .limit(10)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderstatus",
        )
    )


PAGINATION_SQL = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderstatus
FROM orders
ORDER BY o_orderdate, o_orderkey
LIMIT 10 OFFSET 10
"""


# ---------- anti / semi joins, set ops ----------

def customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Anti-join — the engine's dedup/existence-probe shape (P9/P6)."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def brands_in_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-join + agg: parts that actually ship, counted per brand."""
    p = load(spark, sf, "part")
    li = load(spark, sf, "lineitem")
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


SEMI_JOIN_SQL = """
SELECT p_brand, count(*) AS n_parts FROM part
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
GROUP BY p_brand
"""


def customer_only_nations(spark: SparkSession, sf: str) -> DataFrame:
    """Set difference: nations with customers but no suppliers (U3)."""
    c = load(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    s = load(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    return c.exceptAll(s)


SET_OPS_SQL = """
SELECT DISTINCT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT DISTINCT s_nationkey AS nationkey FROM supplier
"""


# ---------- scalar / string / date functions ----------

def orders_by_year(spark: SparkSession, sf: str) -> DataFrame:
    """Date parse/extract/format (P4 analog)."""
    o = load(spark, sf, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_date"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_date"),
        )
    )


ORDERS_BY_YEAR_SQL = """
SELECT year(o_orderdate) AS order_year, count(*) AS n,
       strftime(min(o_orderdate), '%Y-%m-%d') AS first_date,
       strftime(max(o_orderdate), '%Y-%m-%d') AS last_date
FROM orders
GROUP BY year(o_orderdate)
"""


def rating_domain_validation(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's stringly rating validation (P3,
    tmdb_data_fetcher.py:170-196): first char of the stringified value if
    it is a digit and the value is in [0, 10], else 'N/A'."""
    ev = load(spark, sf, "events")
    as_str = F.col("value").cast("decimal(12,1)").cast("string")
    rating = F.when(
        (F.col("value") >= 0)
        & (F.col("value") <= 10)
        & F.substring(as_str, 1, 1).rlike("[0-9]"),
        F.substring(as_str, 1, 1),
    ).otherwise(F.lit("N/A"))
    return ev.select(rating.alias("rating")).groupBy("rating").agg(
        F.count(F.lit(1)).alias("n")
    )


RATING_SQL = """
SELECT rating, count(*) AS n FROM (
  SELECT CASE WHEN value >= 0 AND value <= 10
                   AND substr(CAST(CAST(value AS DECIMAL(12,1)) AS VARCHAR), 1, 1)
                       SIMILAR TO '[0-9]'
              THEN substr(CAST(CAST(value AS DECIMAL(12,1)) AS VARCHAR), 1, 1)
              ELSE 'N/A' END AS rating
  FROM events
)
GROUP BY rating
"""


def suppliers_per_nation(spark: SparkSession, sf: str) -> DataFrame:
    """String aggregation (A5/J3: concat_ws over collect_list)."""
    s = load(spark, sf, "supplier")
    n = F.broadcast(load(spark, sf, "nation"))
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.concat_ws(", ", F.array_sort(F.collect_list("s_name"))).alias("supplier_list"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )


STRING_AGG_SQL = """
SELECT n_name,
       string_agg(s_name, ', ' ORDER BY s_name) AS supplier_list,
       count(*) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def first_customer_per_segment(spark: SparkSession, sf: str) -> DataFrame:
    """First-of-group (A6: genre_series.iloc[0] analog) via min_by."""
    c = load(spark, sf, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.min_by("c_name", "c_custkey").alias("first_customer"),
        F.min("c_custkey").alias("first_custkey"),
    )


FIRST_OF_GROUP_SQL = """
SELECT c_mktsegment, arg_min(c_name, c_custkey) AS first_customer,
       min(c_custkey) AS first_custkey
FROM customer GROUP BY c_mktsegment
"""


def conjunctive_search_documents(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's conjunctive multi-field search surface
    (graphql_interface.py:33-39) over documents: AND of per-field terms."""
    from etl_kafka_project_spark import serving

    d = load(spark, sf, "documents")
    return serving.search(
        d, text={"text": "spark, join"}, exact={"lang": "en"}, limit=None
    ).select("doc_id", "lang", "n_chars")


CONJ_SEARCH_SQL = """
SELECT doc_id, lang, n_chars FROM documents
WHERE lang = 'en'
  AND contains(lower(text), 'spark')
  AND contains(lower(text), 'join')
"""


# ---------- wide multi-join analytics (TPC-H Q7/Q9/Q10 shapes) ----------

def q7_nation_trade_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between supplier nation
    and customer nation by ship year. Join strategy is scale-honest:
    only ``nation`` (25 rows, constant at every SF) is explicitly
    broadcast. orders/customer/supplier all GROW with SF — at 100 TB
    none of them fits a broadcast — so those joins are left to
    Catalyst/AQE: shuffle hash joins on their keys (lineitem⋈orders
    co-partitions on orderkey, the dominant co-location), with AQE
    free to downgrade to broadcast at small SF where the side is
    actually tiny. Columns are pruned before every join so the
    shuffles move only the 4 needed lineitem columns."""
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            # exact decimal accumulation: double sums are order-dependent
            # (parallel aggregation!) and the true per-group totals have
            # <= 4 decimals, so some land exactly on a .xx5 rounding
            # boundary where the last ulp flips the cent; quantizing each
            # row to decimal BEFORE the sum makes the aggregate exact and
            # engine/partitioning-independent
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")),
                2,
            )
            .cast("double")
            .alias("volume"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q7_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2)
            AS DOUBLE) AS volume,
       count(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
"""


def q9_product_type_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for a
    part-name slice. Profit uses p_retailprice as the cost basis (the
    driver schema has no partsupp). Join strategy as in Q7: broadcast
    only the constant-size ``nation``; part/orders/supplier grow with
    SF and join via shuffle (AQE may localize them at small SF). The
    selective p_name filter is applied BEFORE the join so the part
    side the shuffle moves is already the slice, and it pushes to the
    part scan as a parquet filter."""
    li = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").filter(F.col("p_name").contains("ol")).select(
        "p_partkey", "p_retailprice"
    )
    o = load(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf, "nation").select("n_nationkey", "n_name")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(
            # decimal accumulation for an order-independent exact sum
            # (see q7_nation_trade_volume)
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.01)
                    ).cast("decimal(28,6)")
                ),
                2,
            )
            .cast("double")
            .alias("profit")
        )
    )


Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           - p_retailprice * l_quantity * 0.01
                           AS DECIMAL(28,6))), 2) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE contains(p_name, 'ol')
GROUP BY n_name, year(o_orderdate)
"""


def q10_returned_item_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer,
    deterministic top-20 (revenue desc, then custkey). Catalyst plans
    TakeOrderedAndProject — no global sort materialization. The
    l_returnflag filter pushes to the lineitem scan (~25% selectivity
    before any shuffle); orders/customer join via shuffle — both grow
    with SF, neither is broadcast-safe at 100 TB."""
    li = load(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf, "customer").select("c_custkey", "c_name", "c_acctbal")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            # decimal accumulation: exact sums make both the values AND
            # the revenue-desc ranking engine/partitioning-independent
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_returned_lines"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2)
            AS DOUBLE) AS revenue,
       count(*) AS n_returned_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def brand_type_revenue_share(spark: SparkSession, sf: str) -> DataFrame:
    """Window over an aggregate: each part type's share of its brand's
    revenue — groupBy then a partition-window sum on the (tiny)
    aggregated frame, so the window shuffles O(brand×type groups), not
    O(rows). part grows with SF so the lineitem⋈part join is a shuffle
    join (AQE localizes it at small SF); only the aggregate is
    windowed."""
    li = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").select("p_partkey", "p_brand", "p_type")
    by_type = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(
            # decimal accumulation (see q7): exact, order-independent
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
            ).alias("_rev")
        )
    )
    w = Window.partitionBy("p_brand")
    return by_type.select(
        "p_brand",
        "p_type",
        F.round("_rev", 2).cast("double").alias("revenue"),
        F.round(
            F.col("_rev").cast("double") / F.sum("_rev").over(w).cast("double") * 100, 3
        ).alias("brand_share_pct"),
    )


BRAND_SHARE_SQL = """
SELECT p_brand, p_type,
       CAST(round(rev, 2) AS DOUBLE) AS revenue,
       round(CAST(rev AS DOUBLE) / CAST(sum(rev) OVER (PARTITION BY p_brand) AS DOUBLE)
             * 100, 3) AS brand_share_pct
FROM (
  SELECT p_brand, p_type,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, p_type
)
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "region_rollup": region_rollup,
    "window_top3_orders": window_top3_orders,
    "pagination_page": pagination_page,
    "customers_without_orders": customers_without_orders,
    "brands_in_lineitem": brands_in_lineitem,
    "customer_only_nations": customer_only_nations,
    "orders_by_year": orders_by_year,
    "rating_domain_validation": rating_domain_validation,
    "suppliers_per_nation": suppliers_per_nation,
    "first_customer_per_segment": first_customer_per_segment,
    "conjunctive_search_documents": conjunctive_search_documents,
    "q7_nation_trade_volume": q7_nation_trade_volume,
    "q9_product_type_profit": q9_product_type_profit,
    "q10_returned_item_revenue": q10_returned_item_revenue,
    "brand_type_revenue_share": brand_type_revenue_share,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "region_rollup": REGION_ROLLUP_SQL,
    "window_top3_orders": WINDOW_TOP3_SQL,
    "pagination_page": PAGINATION_SQL,
    "customers_without_orders": ANTI_JOIN_SQL,
    "brands_in_lineitem": SEMI_JOIN_SQL,
    "customer_only_nations": SET_OPS_SQL,
    "orders_by_year": ORDERS_BY_YEAR_SQL,
    "rating_domain_validation": RATING_SQL,
    "suppliers_per_nation": STRING_AGG_SQL,
    "first_customer_per_segment": FIRST_OF_GROUP_SQL,
    "conjunctive_search_documents": CONJ_SEARCH_SQL,
    "q7_nation_trade_volume": Q7_SQL,
    "q9_product_type_profit": Q9_SQL,
    "q10_returned_item_revenue": Q10_SQL,
    "brand_type_revenue_share": BRAND_SHARE_SQL,
}
