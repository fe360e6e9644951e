"""The driver contract surface: entry() smoke, every queries() entry vs
its DuckDB oracle_sql() twin at sf0.001 (the driver runs sf0.01 — same
code path), and pinned values for the non-SQL mapInPandas operator."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tools.check_oracles import compare, duck_connection

SF = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "props_sha256" in df.columns
    assert all(len(r["props_sha256"]) == 64 for r in rows)


def test_every_query_has_oracle_or_is_declared(spark):
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(queries)
    # round 2: EVERY query has a DuckDB oracle twin (the mapInPandas
    # feature extractor gained a codepoint-stat oracle — ASCII payloads)
    assert set(queries) - set(oracles) == set()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    verdict = compare(name, fn(spark, SF), duck, entrymod.oracle_sql()[name])
    assert verdict == "OK", verdict


def test_multimodal_features_values(spark):
    """Pin the mapInPandas operator's values independently of the SQL
    oracle (belt and suspenders for the Arrow batch path)."""
    out = entrymod.queries()["multimodal_features"](spark, SF)
    row = {r["doc_id"]: r for r in out.collect()}[0]
    import duckdb

    text = duckdb.sql(
        f"select text from read_parquet('{SF}/documents.parquet') where doc_id=0"
    ).fetchone()[0]
    raw = text.encode("utf-8")
    assert row["n_bytes"] == len(raw)
    assert row["first_byte"] == raw[0]
    assert row["mean_byte"] == sum(raw) / len(raw)


def test_frame_sample_builtin_equals_mapinpandas(spark):
    """The mapInPandas frame sampler's per-payload Python loop is a
    CODEC placeholder, not a semantic dependency: the pure-expression
    twin (explode(sequence) + substring + ascii) must return identical
    rows (round-3 verdict item)."""
    key = ["doc_id", "frame_idx"]
    py = entrymod.queries()["multimodal_frame_sample"](spark, SF)
    jvm = entrymod.queries()["multimodal_frame_sample_builtin"](spark, SF)
    got_py = sorted(tuple(r) for r in py.collect())
    got_jvm = sorted(tuple(r) for r in jvm.collect())
    assert got_py == got_jvm and len(got_py) > 0
    assert py.columns == jvm.columns


def test_multimodal_decode_is_stubbed():
    from etl_kafka_project_spark.ops.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
