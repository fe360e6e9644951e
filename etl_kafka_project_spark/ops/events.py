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


QUERIES = {
    "lww_latest_per_key": lww_latest_per_key,
    "dedup_exact_events": dedup_exact_events,
    "windowed_throughput": windowed_throughput,
}

ORACLES = {
    "lww_latest_per_key": LWW_SQL,
    "dedup_exact_events": DEDUP_EVENTS_SQL,
    "windowed_throughput": WINDOWED_SQL,
}
