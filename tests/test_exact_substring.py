"""ExactSubstr production parameters (round-5 VERDICT #6): K is config
with the Lee-et-al-faithful 50-token default, the span detector emits
positions, and the removal composition drops every non-keeper duplicated
span so exactly one copy survives corpus-wide."""

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


def _spans_of(df, k):
    """exact_substring_spans over an arbitrary docs frame (the
    registered query reads the sf tables; tests reuse its internals via
    a temp view is overkill — recompute with the same operator body by
    monkey-loading is fragile, so just call the public pieces)."""
    from etl_kafka_project_spark.ops.dedup import _span_hashes_with_pos
    from pyspark.sql import Window

    g = _span_hashes_with_pos(df, k).select("doc_id", "pos", "h")
    per_doc = g.groupBy("h", "doc_id").agg(F.min("pos").alias("pos"))
    w = Window.partitionBy("h")
    wk = Window.partitionBy("h").orderBy("doc_id", "pos")
    return (
        per_doc.withColumn("n_docs", F.count(F.lit(1)).over(w))
        .withColumn("is_keeper", F.row_number().over(wk) == 1)
        .filter(F.col("n_docs") >= 2)
        .select("doc_id", "pos", F.col("h").alias("span_md5"), "is_keeper")
    )


def test_spans_positions_and_keeper_on_hand_fixture(spark):
    docs = _fixture(spark)
    rows = sorted(
        _spans_of(docs, 8).collect(), key=lambda r: (r["doc_id"], r["pos"])
    )
    # exactly one duplicated hash: 'a b c d e f g h' at doc0 pos1 (the
    # keeper, min doc_id) and doc1 pos3
    assert [(r["doc_id"], r["pos"], r["is_keeper"]) for r in rows] == [
        (0, 1, True),
        (1, 3, False),
    ]
    assert len({r["span_md5"] for r in rows}) == 1


def test_removal_leaves_exactly_one_copy(spark):
    docs = _fixture(spark)
    spans = _spans_of(docs, 8)
    out = {
        r["doc_id"]: r
        for r in remove_dup_spans(docs, spans, 8).collect()
    }
    # keeper doc untouched; non-keeper loses its 8 covered tokens;
    # untouched doc passes through the left join unchanged
    assert out[0]["dedup_text"] == "a b c d e f g h x y"
    assert out[0]["n_removed_tokens"] == 0
    assert out[1]["dedup_text"] == "z z"
    assert out[1]["n_removed_tokens"] == 8
    assert out[2]["n_removed_tokens"] == 0
    # composition invariant: recomputing the span detector on the
    # redacted corpus finds NO duplicated span — one copy survives
    redacted = remove_dup_spans(docs, spans, 8).select(
        "doc_id", F.col("dedup_text").alias("text")
    )
    assert _spans_of(redacted, 8).count() == 0


def test_removal_is_monotone_on_corpus(spark):
    """On the synthetic corpus: the removal pass strictly reduces total
    duplicated-span mass and every non-keeper occurrence disappears."""
    from etl_kafka_project_spark.ops.text import load

    docs = load(spark, SF, "documents").select("doc_id", "text")
    spans = _spans_of(docs, FIXTURE_SUBSTR_K)
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
        r["span_md5"] for r in _spans_of(redacted, FIXTURE_SUBSTR_K).collect()
    }
    assert not (before & after)
