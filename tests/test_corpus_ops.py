"""Partitioning-independence of the round-4 corpus operators.

The driver's oracle harness pins each operator's VALUES against DuckDB
at one shuffle width; these tests pin the property that makes those
values trustworthy at cluster scale: the result must be byte-identical
no matter how the shuffle is partitioned. Every op was designed for
this — repetition and the quality features are row-local, the card and
surprisal aggregate in exact integer bases, packing is order-defined —
so a different `spark.sql.shuffle.partitions` (different reducer
counts, different partial-agg merge orders, different task interleave)
must not move a single value. A float summed in shuffle order would
fail this immediately.
"""

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

ROUND4_OPS = [
    "repetition_top_bigram",
    "decontamination_overlap",
    "corpus_stats_by_source",
    "pack_sequences",
    "unigram_surprisal",
    "curated_corpus",
    "dsir_importance",
    "semdedup_prune",
    "exact_substring_dup",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", ROUND4_OPS)
def test_result_independent_of_shuffle_width(spark, name):
    fn = entrymod.queries()[name]
    widths = ["2", "32"]
    seen = []
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for w in widths:
            spark.conf.set("spark.sql.shuffle.partitions", w)
            seen.append(_rows(fn(spark, SF)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert seen[0] == seen[1], f"{name} result depends on shuffle width"
