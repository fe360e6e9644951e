"""Operator library over the driver test tables (TESTDATA.md).

Each module exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, ANSI-SQL str]`` — the DuckDB twin the driver runs
side-by-side (``__spark_entry__.py`` merges them). Column names and
rounding are aligned on both sides so the order-insensitive value-hash
matches. Modules:

* ``relational`` — scans, filters, joins (broadcast/semi/anti), agg,
  window, sort/limit/offset, set ops, date/string/domain functions —
  the SURVEY §2 relational surface over the TPC-H-ish tables,
* ``events``     — CDC-shaped ops on the ``events`` stream table (LWW
  latest-per-key, exact dedup, tumbling-window throughput),
* ``text``       — token stats, quality scoring, language-ID heuristic,
  content hashing, document fingerprinting over ``documents``,
* ``dedup``      — exact / minhash-LSH / simhash / n-gram-Jaccard /
  embedding-cosine near-dup detection,
* ``similarity`` — brute-force cosine top-k + LSH hyperplane bucketing
  over ``embeddings``,
* ``multimodal`` — opaque-binary column plumbing (pack / metadata /
  pandas-UDF feature extraction; decode stubbed — no codec libs here),
* ``curation``   — near-dup cluster election (connected components over
  LSH pairs), deterministic train/val/test split, stratified sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
