"""End-to-end composition of the engine's two halves (round-3 verdict
item): a CDC stream is replayed into the lake, then the pretraining
corpus filter runs over the RESOLVED lake table (merged ``content``),
and a DuckDB oracle over a dump of that same resolved table must agree
exactly. Proves the training-data operators consume live CDC output,
not just the static documents parquet."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import types as T

from etl_kafka_project_spark.cdc.envelope import EVENT_SCHEMA
from etl_kafka_project_spark.cdc.fixtures import StreamSpec, generate_stream
from etl_kafka_project_spark.cdc.merge import create_code_table
from etl_kafka_project_spark.cdc.stream import ReplayJob
from etl_kafka_project_spark.config import EngineConfig
from etl_kafka_project_spark.minilake.table import LakeTable
from etl_kafka_project_spark.ops.text import STOPWORDS, corpus_filter_frame

CFG = EngineConfig(n_buckets=8)

_STOP = ", ".join(f"'{w}'" for w in STOPWORDS)

#: the corpus filter's semantics in DuckDB, over the resolved table dump
ORACLE_SQL = f"""
WITH base AS (
  SELECT repo, path, lang, content AS text,
         string_split(lower(content), ' ') AS toks
  FROM resolved WHERE content IS NOT NULL
),
scored AS (
  SELECT repo, path, lang, len(toks) AS n_tokens,
         4 * CAST(round(round(CAST(least(length(text), 500) AS DOUBLE) / 500.0, 4) * 10000) AS BIGINT)
       + 3 * CAST(round(round(CAST(len(list_distinct(toks)) AS DOUBLE)
                              / CAST(len(toks) AS DOUBLE), 4) * 10000) AS BIGINT)
       + 3 * (10000 - least(2 * CAST(round(round(CAST(len(list_filter(toks, t -> t IN ({_STOP}))) AS DOUBLE)
                                           / CAST(len(toks) AS DOUBLE), 4) * 10000) AS BIGINT), 10000))
         AS quality_scaled,
         text
  FROM base
),
keepers AS (
  SELECT repo, path FROM (
    SELECT repo, path,
           row_number() OVER (PARTITION BY sha256(text) ORDER BY repo, path) AS rk
    FROM base
  ) WHERE rk = 1
)
SELECT s.repo, s.path, s.n_tokens, s.quality_scaled
FROM scored s JOIN keepers k USING (repo, path)
WHERE s.lang = '{{lang}}' AND s.quality_scaled >= {{minq}}
"""


@pytest.fixture(scope="module")
def resolved_table(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pipeline")
    spec = StreamSpec(n_events=1200, n_keys=150, n_segments=4, min_lines=3, max_lines=8)
    generate_stream(str(tmp / "stream"), spec)
    create_code_table(spark, str(tmp / "table"), CFG)
    job = ReplayJob(
        table_root=str(tmp / "table"),
        stream_dir=str(tmp / "stream"),
        checkpoint_dir=str(tmp / "ckpt"),
        config=CFG,
    )
    job.run(spark)

    # Inject cross-key EXACT duplicates so the filter's dedup stage is
    # non-vacuous (fixture content embeds repo/path, so the replay alone
    # produces no cross-key dups): one extra epoch of inserts copying
    # existing keys' content under new keys.
    table = LakeTable(spark, str(tmp / "table"))
    donors = (
        table.read()
        .filter("content is not null")
        .select("repo", "path", "lang", "content")
        .orderBy("repo", "path")
        .limit(5)
        .collect()
    )
    rows = [
        (10_000 + i, "I", f"zz-dup-{i}", "copy.txt", "c0", d["lang"], d["content"])
        for i, d in enumerate(donors)
    ]
    pdf = pd.DataFrame(
        rows, columns=["lsn", "op", "repo", "path", "commit", "lang", "content"]
    )
    pdf["ts"] = pd.Timestamp("2024-06-01")
    schema = T.StructType([f for f in EVENT_SCHEMA.fields])
    dup_events = spark.createDataFrame(pdf[[f.name for f in schema.fields]], schema)
    job.apply_epoch(dup_events, epoch_id=len(job.applied))

    return LakeTable(spark, str(tmp / "table"))


def test_corpus_filter_over_replayed_lake_table(spark, resolved_table):
    live = resolved_table.read().select("repo", "path", "lang", "content")
    dump = live.toPandas()

    con = duckdb.connect()
    con.register("resolved", dump)
    lang = con.execute(
        "SELECT lang FROM resolved WHERE content IS NOT NULL"
        " GROUP BY lang ORDER BY count(*) DESC, lang LIMIT 1"
    ).fetchone()[0]
    minq = int(
        con.execute(
            ORACLE_SQL.replace("WHERE s.lang = '{lang}' AND s.quality_scaled >= {minq}", "")
            .replace("SELECT s.repo, s.path, s.n_tokens, s.quality_scaled",
                     "SELECT median(s.quality_scaled) AS m")
        ).fetchone()[0]
    )

    got = (
        corpus_filter_frame(live, ["repo", "path"], "content", "lang", lang, minq)
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    want = (
        con.execute(ORACLE_SQL.format(lang=lang, minq=minq))
        .df()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    con.close()

    # proper subset: both gates and the dedup stage did real work
    n_live = len(dump[dump.content.notna()])
    assert 0 < len(got) < n_live
    # the injected duplicate keys must have been deduped away (their
    # donors sort first on (repo, path))
    assert not got["repo"].str.startswith("zz-dup").any()
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)
