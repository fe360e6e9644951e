"""End-to-end replay equivalence: micro-batched engine merges vs the pandas
oracle — the final-state correctness gate (BASELINE.json metric)."""

import pandas as pd
import pytest

from etl_kafka_project_spark.cdc.envelope import EVENT_SCHEMA
from etl_kafka_project_spark.cdc.fixtures import StreamSpec, generate_events
from etl_kafka_project_spark.cdc.merge import create_code_table, merge_events
from etl_kafka_project_spark.cdc.oracle import replay_oracle
from etl_kafka_project_spark.config import EngineConfig

CFG = EngineConfig(n_buckets=8)


def _final_state_pdf(table):
    df = table.read().select(
        "repo", "path", "commit", "lang", "content", "content_sha256", "last_lsn", "row_version"
    )
    pdf = df.toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    return pdf


def _replay_in_batches(spark, table, events: pd.DataFrame, n_batches: int):
    n = len(events)
    size = -(-n // n_batches)
    for i in range(n_batches):
        chunk = events.iloc[i * size : (i + 1) * size]
        if chunk.empty:
            continue
        sdf = spark.createDataFrame(chunk, EVENT_SCHEMA)
        merge_events(table, sdf, CFG, epoch=("t", i))


@pytest.mark.parametrize("n_batches", [1, 7])
def test_replay_matches_oracle(spark, tmp_table_dir, n_batches):
    spec = StreamSpec(n_events=1500, n_keys=200, n_segments=5, min_lines=2, max_lines=5)
    events = generate_events(spec)
    table = create_code_table(spark, tmp_table_dir, CFG)
    _replay_in_batches(spark, table, events, n_batches)

    got = _final_state_pdf(table)
    want = replay_oracle(events).reindex(columns=got.columns)
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_dtype=False
    )


def test_replay_with_in_batch_duplicates_matches_oracle(spark, tmp_table_dir):
    spec = StreamSpec(n_events=600, n_keys=80, min_lines=2, max_lines=4)
    events = generate_events(spec)
    # inject verbatim duplicates inside the (single) batch
    dup = events.sample(frac=0.05, random_state=7)
    noisy = (
        pd.concat([events, dup], ignore_index=True)
        .sample(frac=1.0, random_state=8)  # scramble arrival order too
        .reset_index(drop=True)
    )
    table = create_code_table(spark, tmp_table_dir, CFG)
    _replay_in_batches(spark, table, noisy, 1)
    got = _final_state_pdf(table)
    want = replay_oracle(events).reindex(columns=got.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_idempotent_reapply_same_fold_is_noop(spark, tmp_table_dir):
    """Applying the same events twice (without epoch skip) must not change
    state — LWW staleness guard (s._max_lsn <= t.last_lsn)."""
    spec = StreamSpec(n_events=300, n_keys=50, min_lines=2, max_lines=3)
    events = generate_events(spec)
    table = create_code_table(spark, tmp_table_dir, CFG)
    sdf = spark.createDataFrame(events, EVENT_SCHEMA)
    merge_events(table, sdf, CFG)
    first = _final_state_pdf(table)
    merge_events(table, sdf, CFG)  # replay, no epoch bookkeeping
    second = _final_state_pdf(table)
    pd.testing.assert_frame_equal(first, second)


def test_sha256_invariant_pandas_udf_equals_builtin(spark, tmp_table_dir):
    from etl_kafka_project_spark.functions.hashing import sha256_pandas

    spec = StreamSpec(n_events=200, n_keys=40, min_lines=2, max_lines=3)
    events = generate_events(spec)
    table = create_code_table(spark, tmp_table_dir, CFG)
    merge_events(table, spark.createDataFrame(events, EVENT_SCHEMA), CFG)
    df = table.read().withColumn("sha_udf", sha256_pandas("content"))
    bad = df.filter(
        ~df.sha_udf.eqNullSafe(df.content_sha256)
    ).count()
    assert bad == 0


def test_mor_cross_epoch_subset_redelivery(spark, tmp_table_dir):
    """A later epoch re-delivering a SUBSET of a key's already-applied
    events must be a complete no-op under MOR (round-1 regression: the
    resolve dropped duplicate delta rows on (key, _max_lsn) and could
    keep the subset row, silently losing the superset's column writes)."""
    import pandas as pd

    events = pd.DataFrame(
        {
            "lsn": pd.array([3, 4, 5], dtype="Int64"),
            "op": ["I", "U", "U"],
            "ts": pd.to_datetime(["2026-01-01"] * 3),
            "repo": ["r"] * 3,
            "path": ["p"] * 3,
            # lsn 3: full insert; lsn 4: lang only; lsn 5: commit only
            "commit": ["c3", None, "c5"],
            "lang": [None, "rust", None],
            "content": ["body3", None, None],
        }
    )
    table = create_code_table(spark, tmp_table_dir, CFG)
    merge_events(table, spark.createDataFrame(events, EVENT_SCHEMA), CFG, epoch=("t", 0))
    # epoch 1 re-delivers ONLY the newest event (lsn 5)
    redelivered = spark.createDataFrame(events[events.lsn == 5], EVENT_SCHEMA)
    merge_events(table, redelivered, CFG, epoch=("t", 1))

    row = table.read().collect()[0].asDict()
    assert row["commit"] == "c5"
    assert row["lang"] == "rust"  # the lsn-4 write must survive
    assert row["content"] == "body3"  # the lsn-3 write must survive
    assert row["last_lsn"] == 5
    assert row["row_version"] == 3  # re-delivery must not re-count

    # same invariant must hold across compaction + a further re-delivery
    from etl_kafka_project_spark.cdc.mor import compact_deltas

    compact_deltas(table)
    merge_events(table, redelivered, CFG, epoch=("t", 2))
    row = table.read().collect()[0].asDict()
    assert (row["commit"], row["lang"], row["content"], row["row_version"]) == (
        "c5", "rust", "body3", 3,
    )
