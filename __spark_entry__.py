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
# first 50 of the 67 registered queries.  Modules whose queries have the
# fewest driver-green rounds sort FIRST (curation/analytics had never
# been driver-attested through round 3; round 4 added seven queries inside the cap
# — repetition_top_bigram, decontamination_overlap,
# corpus_stats_by_source, pack_sequences, unigram_surprisal,
# curated_corpus, dsir_importance);
# similarity+multimodal and the tail of dedup (multiple green rounds
# r1-r3) rotate past the cap this round.
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


# Queries with multiple driver-green rounds (r1-r3) rotated past the
# 50-entry cap to free in-cap slots for round-4-new queries
# (pii_redaction, semdedup_prune, exact_substring_dup) that have never
# been driver-attested; the new dedup-module query is promoted to the
# front because its module sorts past the cap.
_ROTATE_PAST_CAP = ["rating_domain_validation", "orders_by_year"]
_PROMOTE_INTO_CAP = ["exact_substring_dup"]


def _rotated(d: dict) -> dict:
    for name in _ROTATE_PAST_CAP:
        if name in d:
            d[name] = d.pop(name)
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
