"""ExactSubstr production parameters (round-5 VERDICT #6): K is config
with the Lee-et-al-faithful 50-token default, the span detector emits
EVERY duplicated occurrence's position (in-doc repeats included), and
the removal composition drops every non-keeper occurrence so at most
one copy of each duplicated span survives corpus-wide (exactly one
when spans don't overlap — see remove_dup_spans' contract)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_kafka_project_spark.ops.dedup import (
    FIXTURE_SUBSTR_K,
    SUBSTR_K,
    exact_substr_sql,
    exact_substring_dup,
    exact_substring_spans,
    remove_dup_spans,
    substring_spans,
)
from tools.check_oracles import compare, duck_connection

SF = "/root/testdata/sf0.001"


def test_default_k_is_paper_faithful():
    assert SUBSTR_K == 50
    assert FIXTURE_SUBSTR_K == 8


@pytest.mark.parametrize("k", [FIXTURE_SUBSTR_K, SUBSTR_K])
def test_exact_substring_dup_oracle_twins_at_both_k(spark, k):
    """Green at both the fixture K and the paper-default K=50: the
    Spark form matches the DuckDB oracle generated at the same k."""
    con = duck_connection(SF)
    try:
        verdict = compare(
            f"exact_substring_dup_k{k}",
            exact_substring_dup(spark, SF, k=k),
            con,
            exact_substr_sql(k),
        )
    finally:
        con.close()
    assert verdict == "OK", verdict


def _fixture(spark):
    return spark.createDataFrame(
        [
            (0, "a b c d e f g h x y"),
            (1, "z z a b c d e f g h"),
            (2, "unique words only here nothing shared at all"),
        ],
        "doc_id long, text string",
    )


def test_spans_positions_and_keeper_on_hand_fixture(spark):
    docs = _fixture(spark)
    rows = sorted(
        substring_spans(docs, 8).collect(),
        key=lambda r: (r["doc_id"], r["pos"]),
    )
    # exactly one duplicated hash: 'a b c d e f g h' at doc0 pos1 (the
    # keeper, min doc_id) and doc1 pos3
    assert [(r["doc_id"], r["pos"], r["is_keeper"]) for r in rows] == [
        (0, 1, True),
        (1, 3, False),
    ]
    assert len({r["span_md5"] for r in rows}) == 1


def test_spans_emit_every_in_doc_occurrence(spark):
    """A span repeated INSIDE one document yields one row per
    occurrence — a min-pos collapse would leave the second copy alive
    after removal (round-5 review finding)."""
    docs = spark.createDataFrame(
        [(0, "a b x"), (1, "a b y a b")], "doc_id long, text string"
    )
    spans = substring_spans(docs, 2)
    rows = sorted(
        spans.collect(), key=lambda r: (r["span_md5"], r["doc_id"], r["pos"])
    )
    dup = [(r["doc_id"], r["pos"], r["is_keeper"]) for r in rows]
    # h('a b') occurs at (0,1) keeper, (1,1) and (1,4) non-keepers
    assert dup == [(0, 1, True), (1, 1, False), (1, 4, False)]
    out = {
        r["doc_id"]: r for r in remove_dup_spans(docs, spans, 2).collect()
    }
    assert out[0]["dedup_text"] == "a b x"
    assert out[1]["dedup_text"] == "y"
    assert out[1]["n_removed_tokens"] == 4
    # exactly one copy survives corpus-wide, and re-running the
    # detector on the output finds nothing
    redacted = remove_dup_spans(docs, spans, 2).select(
        "doc_id", F.col("dedup_text").alias("text")
    )
    assert substring_spans(redacted, 2).count() == 0


def test_removal_preserves_original_case(spark):
    """Hash matching is case-insensitive but the surviving text keeps
    its original bytes — lowercasing the output would corrupt the
    training artifact (round-5 review finding)."""
    docs = spark.createDataFrame(
        [(0, "Hello World X"), (1, "hello world Y"), (2, "No Dups HERE")],
        "doc_id long, text string",
    )
    spans = substring_spans(docs, 2)
    out = {
        r["doc_id"]: r for r in remove_dup_spans(docs, spans, 2).collect()
    }
    assert out[0]["dedup_text"] == "Hello World X"  # keeper, untouched
    assert out[1]["dedup_text"] == "Y"
    assert out[2]["dedup_text"] == "No Dups HERE"  # no-span passthrough


def test_overlapping_spans_remove_at_most_one_copy(spark):
    """Documented overlap interaction: removing a non-keeper occurrence
    of one span may truncate another span's keeper. The contract is AT
    MOST one surviving copy (duplicated mass strictly shrinks), and a
    fixpoint re-run converges to zero duplicated spans."""
    docs = spark.createDataFrame(
        [(0, "b c"), (1, "a b c"), (2, "a b")], "doc_id long, text string"
    )
    spans = substring_spans(docs, 2)
    out = remove_dup_spans(docs, spans, 2)
    redacted = out.select("doc_id", F.col("dedup_text").alias("text"))
    # doc1's keeper 'a b' was truncated by removing its non-keeper
    # 'b c' — zero copies of h('a b') survive, never two
    assert substring_spans(redacted, 2).count() == 0
    total_before = docs.select(F.sum(F.size(F.split("text", " ")))).first()[0]
    total_after = out.select(
        F.sum(F.size(F.split("dedup_text", " ")))
    ).first()[0]
    assert total_after < total_before


def test_fixpoint_converges_in_two_rounds(spark):
    """Removal can CREATE a new duplicated k-gram by re-joining
    survivors; the fixpoint pass iterates until none remains. Here
    deleting doc2's non-keeper 'z1 z2' makes doc2 collapse to 'm n',
    duplicating doc1 — caught and removed in round 2."""
    from etl_kafka_project_spark.ops.dedup import remove_dup_spans_fixpoint

    docs = spark.createDataFrame(
        [(0, "z1 z2"), (1, "m n"), (2, "m z1 z2 n")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in remove_dup_spans_fixpoint(docs, 2).collect()
    }
    assert out[0]["dedup_text"] == "z1 z2"
    assert out[1]["dedup_text"] == "m n"
    assert out[2]["dedup_text"] == ""
    assert out[2]["n_removed_tokens"] == 4  # 2 in round 1, 2 in round 2
    assert out[0]["n_rounds"] == 2
    final = spark.createDataFrame(
        [(k, v["dedup_text"]) for k, v in out.items()],
        "doc_id long, text string",
    )
    assert substring_spans(final, 2).count() == 0


def test_fixpoint_noop_on_clean_corpus(spark):
    from etl_kafka_project_spark.ops.dedup import remove_dup_spans_fixpoint

    docs = spark.createDataFrame(
        [(0, "all distinct words"), (1, "other tokens entirely")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in remove_dup_spans_fixpoint(docs, 2).collect()}
    assert rows[0]["dedup_text"] == "all distinct words"
    assert rows[0]["n_removed_tokens"] == 0
    assert rows[0]["n_rounds"] == 0


def test_removal_is_monotone_on_corpus(spark):
    """On the synthetic corpus, driven through the REGISTERED operator:
    the removal pass strictly reduces total duplicated-span mass and
    every non-keeper occurrence disappears."""
    from etl_kafka_project_spark.ops.text import load

    docs = load(spark, SF, "documents").select("doc_id", "text")
    spans = exact_substring_spans(spark, SF, k=FIXTURE_SUBSTR_K)
    n_nonkeeper = spans.filter(~F.col("is_keeper")).count()
    if n_nonkeeper == 0:
        pytest.skip("corpus has no duplicated spans at this k")
    out = remove_dup_spans(docs, spans, FIXTURE_SUBSTR_K)
    removed = out.agg(F.sum("n_removed_tokens")).collect()[0][0]
    assert removed >= n_nonkeeper  # each non-keeper span covers >=1 token
    # the specific duplicated hashes can no longer appear in >=2 docs
    redacted = out.select("doc_id", F.col("dedup_text").alias("text"))
    before = {r["span_md5"] for r in spans.collect()}
    after = {
        r["span_md5"]
        for r in substring_spans(redacted, FIXTURE_SUBSTR_K).collect()
    }
    assert not (before & after)
