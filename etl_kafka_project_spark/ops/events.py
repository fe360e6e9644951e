"""CDC-shaped operators over the ``events`` stream table
(event_id = the monotonic LSN analog; user_id = the key).

These are the engine's core semantics (SURVEY §2.3 J1, §2.5, §2.8)
expressed as plain batch queries so the DuckDB oracle can check them:
LWW-latest-per-key (the merge's window), exact dedup (T7), and
tumbling-window throughput (the lineage metric shape, T3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_kafka_project_spark.ops import load


def lww_latest_per_key(spark: SparkSession, sf: str) -> DataFrame:
    """row_number() OVER (PARTITION BY key ORDER BY lsn DESC) == 1 —
    the north rule's LWW window, on events keyed by user_id."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("event_id"))
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.round("value", 4).alias("last_value"),
        )
    )


LWW_SQL = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
       round(value, 4) AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rk
  FROM events
)
WHERE rk = 1
"""


def dedup_exact_events(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup by (user_id, event_type): keep the first event
    (min lsn) per group — dropDuplicates made deterministic."""
    ev = load(spark, sf, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )


DEDUP_EVENTS_SQL = """
SELECT user_id, event_type, min(event_id) AS first_event_id, count(*) AS n_dups
FROM events GROUP BY user_id, event_type
"""


def windowed_throughput(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1-day window per event_type — the shape of the engine's
    per-epoch throughput metrics (cdc/metrics.py), as a checkable query."""
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


WINDOWED_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def asof_prior_event_per_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join (no native Spark operator): for each *purchase* event,
    the latest STRICTLY EARLIER event of the same user (any type) — i.e.
    "what was this user doing right before they bought". Expressed as
    equi-join on the key + row_number over the time predicate — the
    composition SURVEY §2.3 prescribes; at scale the range key gets
    bucketized first. Both sides come from the ``events`` table so every
    purchase after a user's first event matches (the round-1 orders×events
    version was vacuously empty: orders end 1998, events start 2024)."""
    ev = load(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_event_id"), F.col("ts").alias("p_ts")
    )
    prior = ev.select("user_id", "event_id", "ts", "event_type")
    j = purchases.join(
        prior,
        (purchases.user_id == prior.user_id)
        & (
            (prior.ts < purchases.p_ts)
            | ((prior.ts == purchases.p_ts) & (prior.event_id < purchases.p_event_id))
        ),
        "inner",
    ).drop(prior.user_id)
    w = Window.partitionBy("p_event_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "p_event_id",
            "user_id",
            F.col("event_id").alias("asof_event_id"),
            F.col("event_type").alias("asof_event_type"),
        )
    )


ASOF_SQL = """
SELECT p_event_id, user_id, asof_event_id, asof_event_type
FROM (
  SELECT p.event_id AS p_event_id, p.user_id,
         e.event_id AS asof_event_id, e.event_type AS asof_event_type,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY e.ts DESC, e.event_id DESC) AS rk
  FROM events p JOIN events e
    ON e.user_id = p.user_id
   AND (e.ts < p.ts OR (e.ts = p.ts AND e.event_id < p.event_id))
  WHERE p.event_type = 'purchase'
)
WHERE rk = 1
"""


def clicks_without_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """Anti-join with a guaranteed-non-empty result: (user, day) pairs
    that saw clicks but NO purchase that day — the value-checked twin of
    ``customers_without_orders``/``customer_only_nations``, which are
    structurally 0-row on the TPC-H-ish testdata (every customer has
    orders). Same left_anti plan shape, real rows hashed."""
    ev = load(spark, sf, "events").withColumn(
        "day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    clicks = ev.filter(F.col("event_type") == "click").groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n_clicks")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "day").distinct()
    return clicks.join(purchases, ["user_id", "day"], "left_anti")


CLICKS_NO_PURCHASE_SQL = """
WITH ev AS (
  SELECT user_id, event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
  FROM events
),
clicks AS (
  SELECT user_id, day, count(*) AS n_clicks FROM ev
  WHERE event_type = 'click' GROUP BY user_id, day
)
SELECT c.user_id, c.day, c.n_clicks
FROM clicks c
WHERE NOT EXISTS (
  SELECT 1 FROM ev p
  WHERE p.event_type = 'purchase' AND p.user_id = c.user_id AND p.day = c.day
)
"""


def sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization: lag(ts) + cumulative sum over gap > 30 days
    (the guide's classic window composition) — per-user session stats."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch_s = F.unix_timestamp(F.col("ts"))
    gap = epoch_s - F.lag(epoch_s).over(w)
    d = ev.withColumn("new_sess", F.when(gap.isNull() | (gap > 30 * 86400), 1).otherwise(0))
    d = d.withColumn("session_id", F.sum("new_sess").over(w))
    return d.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )


SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(epoch(ts)) OVER w IS NULL
                   OR epoch(ts) - lag(epoch(ts)) OVER w > 30 * 86400
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  -- CAST: DuckDB sum() over integers yields HUGEINT, which fetchdf()
  -- materializes as float64 and the driver's value hash then mismatches
  -- Spark's int64 — cast back so both engines hash the same longs
  SELECT user_id, ts,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
FROM s GROUP BY user_id, session_id
"""


def pivot_event_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot: per-user counts per event type as columns (explicit value
    list so the output schema is static and oracle-checkable)."""
    ev = load(spark, sf, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
        .withColumnsRenamed({t: f"n_{t}" for t in ["click", "view", "purchase", "signup", "error"]})
    )


PIVOT_SQL = """
SELECT user_id,
       count(*) FILTER (event_type = 'click')    AS n_click,
       count(*) FILTER (event_type = 'view')     AS n_view,
       count(*) FILTER (event_type = 'purchase') AS n_purchase,
       count(*) FILTER (event_type = 'signup')   AS n_signup,
       count(*) FILTER (event_type = 'error')    AS n_error
FROM events GROUP BY user_id
"""


def rollup_orders(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP over (status, priority): subtotal + grand-total rows."""
    o = load(spark, sf, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


QUERIES = {
    "lww_latest_per_key": lww_latest_per_key,
    "dedup_exact_events": dedup_exact_events,
    "windowed_throughput": windowed_throughput,
    "asof_prior_event_per_purchase": asof_prior_event_per_purchase,
    "clicks_without_purchase": clicks_without_purchase,
    "sessionize": sessionize,
    "pivot_event_counts": pivot_event_counts,
    "rollup_orders": rollup_orders,
}

ORACLES = {
    "lww_latest_per_key": LWW_SQL,
    "dedup_exact_events": DEDUP_EVENTS_SQL,
    "windowed_throughput": WINDOWED_SQL,
    "asof_prior_event_per_purchase": ASOF_SQL,
    "clicks_without_purchase": CLICKS_NO_PURCHASE_SQL,
    "sessionize": SESSIONIZE_SQL,
    "pivot_event_counts": PIVOT_SQL,
    "rollup_orders": ROLLUP_SQL,
}
