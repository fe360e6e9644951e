"""PII redaction: the scrub must be complete (zero residual matches in
the redacted output), the counts must equal the deterministic fixture's
injection schedule, and the result must be shuffle-width independent
(it is map-only, so any width dependence would mean a planner bug).
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from etl_kafka_project_spark.ops import load
from etl_kafka_project_spark.ops.text import (
    _PII_AUGMENT_SQL,
    PII_EMAIL_RE,
    PII_IP_RE,
    PII_PHONE_RE,
    pii_redaction,
)

SF = "/root/testdata/sf0.001"


def test_counts_match_injection_schedule(spark):
    out = pii_redaction(spark, SF)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows, "empty result"
    for doc_id, r in rows.items():
        assert r["n_emails"] == (1 if doc_id % 5 == 0 else 0), doc_id
        assert r["n_phones"] == (1 if doc_id % 7 == 0 else 0), doc_id
        assert r["n_ips"] == (1 if doc_id % 11 == 0 else 0), doc_id
        assert r["has_pii"] == (r["n_emails"] + r["n_phones"] + r["n_ips"] > 0)
    assert any(r["has_pii"] for r in rows.values()), "fixture injected no PII"


def test_redaction_is_complete(spark):
    # Re-derive the redacted TEXT (the query itself only emits its sha)
    # and assert no pattern survives the scrub.
    d = load(spark, SF, "documents").withColumn("_t", F.expr(_PII_AUGMENT_SQL))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("_t"), F.lit(PII_EMAIL_RE), F.lit("<EMAIL>")),
            F.lit(PII_PHONE_RE),
            F.lit("<PHONE>"),
        ),
        F.lit(PII_IP_RE),
        F.lit("<IP>"),
    )
    residual = d.select(
        (
            F.regexp_count(red, F.lit(PII_EMAIL_RE))
            + F.regexp_count(red, F.lit(PII_PHONE_RE))
            + F.regexp_count(red, F.lit(PII_IP_RE))
        ).alias("n")
    ).agg(F.sum("n").alias("total")).collect()[0]["total"]
    assert residual == 0


def test_shuffle_width_independent(spark):
    fn = entrymod.queries()["pii_redaction"]
    original = spark.conf.get("spark.sql.shuffle.partitions")
    seen = []
    try:
        for w in ["2", "32"]:
            spark.conf.set("spark.sql.shuffle.partitions", w)
            seen.append(sorted(tuple(r) for r in fn(spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert seen[0] == seen[1]


def test_operator_runs_on_raw_text_without_fixture(spark):
    """ADVICE round-4 item: the OPERATOR must not fuse the synthetic
    fixture. redact_pii over the raw corpus column injects nothing —
    the clean corpus has zero PII and the redacted text is byte-equal
    to the input."""
    from etl_kafka_project_spark.ops.text import redact_pii

    d = load(spark, SF, "documents").select("doc_id", "text")
    out = redact_pii(d, "text")
    agg = out.agg(
        F.sum("n_emails").alias("e"),
        F.sum("n_phones").alias("p"),
        F.sum("n_ips").alias("i"),
        F.sum(F.when(F.col("redacted_text") != F.col("text"), 1).otherwise(0)).alias(
            "changed"
        ),
    ).collect()[0]
    assert (agg["e"], agg["p"], agg["i"], agg["changed"]) == (0, 0, 0, 0)


def test_operator_redacts_real_pii_strings(spark):
    from etl_kafka_project_spark.ops.text import redact_pii

    df = spark.createDataFrame(
        [
            (0, "mail me at jane.doe+x@example.org or call 555-867-5309"),
            (1, "server at 192.168.1.17 is fine"),
            (2, "overlap case: 555-123-4567@example.com"),
            (3, "nothing here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(df, "text").collect()}
    assert rows[0]["n_emails"] == 1 and rows[0]["n_phones"] == 1
    assert "<EMAIL>" in rows[0]["redacted_text"] and "<PHONE>" in rows[0]["redacted_text"]
    assert rows[1]["n_ips"] == 1 and "<IP>" in rows[1]["redacted_text"]
    # counts are against the ORIGINAL text: the phone-inside-email case
    # counts both, but the email replacement (first in the chain)
    # consumes the phone digits — order is load-bearing and pinned
    assert rows[2]["n_emails"] == 1 and rows[2]["n_phones"] == 1
    assert rows[2]["redacted_text"] == "overlap case: <EMAIL>"
    assert not rows[3]["has_pii"] and rows[3]["redacted_text"] == "nothing here"
