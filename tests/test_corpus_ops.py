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
    # round-5 additions: same exact-integer-basis discipline
    "quality_classifier_score",
    "bigram_surprisal",
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


def test_classifier_margin_semantics(spark):
    """The hashed-linear-model inference: the keep decision IS the sign
    of the exact integer margin, the mean is the margin over the token
    count, and the per-token weights live in [-0.5, 0.5) so the mean is
    bounded — pinned independently of the SQL oracle."""
    out = entrymod.queries()["quality_classifier_score"](spark, SF).collect()
    assert len(out) > 0
    tok = {
        r["doc_id"]: r["n_ws_tokens"]
        for r in entrymod.queries()["token_stats"](spark, SF).collect()
    }
    for r in out:
        assert r["kept"] == (r["margin_total_scaled"] >= 0)
        assert r["n_tokens"] == tok[r["doc_id"]]
        assert -0.5 <= r["margin_mean"] < 0.5
    # the deterministic weight deal is balanced enough that the gate is
    # a real filter, not a constant
    kept = sum(1 for r in out if r["kept"])
    assert 0 < kept < len(out)


def test_bigram_surprisal_semantics(spark):
    """Conditional-LM gate shape: every doc with n tokens contributes
    exactly n-1 bigrams, surprisal is positive (p < 1 under add-one
    smoothing), and the flag thresholds the mean."""
    out = entrymod.queries()["bigram_surprisal"](spark, SF).collect()
    assert len(out) > 0
    tok = {
        r["doc_id"]: r["n_ws_tokens"]
        for r in entrymod.queries()["token_stats"](spark, SF).collect()
    }
    from etl_kafka_project_spark.ops.text import _BIGRAM_PPL_GATE

    for r in out:
        assert r["n_bigrams"] == tok[r["doc_id"]] - 1
        assert r["total_surprisal_scaled"] > 0
        assert r["high_perplexity"] == (r["mean_surprisal"] >= _BIGRAM_PPL_GATE)
    # the calibrated gate flags a real tail, not a constant column
    assert 0 < sum(1 for r in out if r["high_perplexity"]) < len(out)
