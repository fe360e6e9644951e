"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (CDC LWW compaction of the events
stream + content hashing) at sf0.001. ``queries()`` / ``oracle_sql()`` —
the operator surface from SURVEY.md §2 plus the training-data-pipeline
operators (dedup / similarity / text analysis / multimodal), each with a
DuckDB oracle twin where SQL can express it (rows-only otherwise).
Implementations live in ``etl_kafka_project_spark/ops/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_kafka_project_spark.ops import analytics as _analytics
from etl_kafka_project_spark.ops import curation as _curation
from etl_kafka_project_spark.ops import dedup as _dedup
from etl_kafka_project_spark.ops import events as _events
from etl_kafka_project_spark.ops import multimodal as _multimodal
from etl_kafka_project_spark.ops import relational as _relational
from etl_kafka_project_spark.ops import similarity as _similarity
from etl_kafka_project_spark.ops import text as _text

# Order matters: the driver's CORRECTNESS harness records at most the
# first 50 of the 70+ registered queries.  Round-5 rotation (VERDICT #3):
# promote the 20 queries absent from CORRECTNESS_r04 (the r1-r3-green
# similarity/multimodal/dedup tail plus rating_domain_validation,
# orders_by_year, doc_fingerprint) back inside the cap, plus any
# round-5-new queries, so that by end of round 5 every registered query
# has a driver-green row within the last two rounds.  The rotated-out
# r4-green queries stay covered by the full-sweep test
# (tests/test_entry_oracles.py::test_query_matches_oracle, parametrized
# over EVERY registered oracle), which runs ALL registered queries
# against their DuckDB oracles regardless of cap order — rotation can
# never silently drop coverage.
_MODULES = [
    _curation,
    _analytics,
    _relational,
    _events,
    _text,
    _dedup,
    _similarity,
    _multimodal,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: LWW-latest state of the events change stream (the CDC
    merge's window semantics) with the sha256 content invariant."""
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    latest = _events.lww_latest_per_key(spark, sf_dir)
    return latest.withColumn(
        "props_sha256",
        F.sha2(F.concat_ws("|", "user_id", "last_event_type"), 256),
    )


# Round-5 promotion list: every query absent from CORRECTNESS_r04
# (rotated past the cap in r4 after multiple r1-r3 green rounds), in
# module order, followed by the round-5-new queries.  These 24 sort
# FIRST so the driver's 50-entry harness attests them this round; the
# r4-green queries fill the remaining 26 in-cap slots in module order
# and are additionally covered by the full-surface sweep in
# tests/test_entry_oracles.py (every registered oracle, cap-independent).
_PROMOTE_INTO_CAP = [
    # absent from r4 — relational / text tail
    "orders_by_year",
    "rating_domain_validation",
    "doc_fingerprint",
    # absent from r4 — dedup tail
    "dedup_exact",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash",
    "simhash_lsh_pairs",
    "ngram_jaccard_adjacent",
    "embedding_neardup_adjacent",
    "embedding_lsh_neardup",
    # absent from r4 — similarity
    "ann_bruteforce_topk",
    "ann_lsh_buckets",
    "ivf_coarse_assignment",
    "ivf_query_topk",
    "ivf_query_topk_indexed",
    # absent from r4 — multimodal
    "multimodal_meta",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_frame_sample_builtin",
    # round-5-new queries (never driver-attested)
    "exact_substring_spans",
    "curated_corpus_packed",
    "quality_classifier_score",
    "bigram_surprisal",
    "kmv_distinct_ndv",
]


def _rotated(d: dict) -> dict:
    promoted = {n: d.pop(n) for n in _PROMOTE_INTO_CAP if n in d}
    promoted.update(d)
    return promoted


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return _rotated(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return _rotated(out)
