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


def test_mor_redelivery_after_compaction_respects_erased_columns(spark, tmp_table_dir):
    """Regression (found by the redelivery property test): a column
    erased by a delete+reset barrier (value@7 → D@12 → I@13 with the
    column null) must STAY null when, AFTER compaction folded the
    barriers into the base row, a later epoch re-delivers the pre-delete
    write. Pre-fix, _encode_base_as_delta stamped null base columns at
    NEVER, so the stale lang@7 out-ranked the base's null-as-of-13 and
    resurrected the erased value."""
    import pandas as pd

    from etl_kafka_project_spark.cdc.mor import compact_deltas

    events = pd.DataFrame(
        {
            "lsn": pd.array([3, 7, 12, 13], dtype="Int64"),
            "op": ["I", "U", "D", "I"],
            "ts": pd.to_datetime(["2026-01-01"] * 4),
            "repo": ["r"] * 4,
            "path": ["p"] * 4,
            "commit": [None] * 4,
            "lang": [None, "go", None, None],
            "content": ["x", None, None, "seed"],
        }
    )
    table = create_code_table(spark, tmp_table_dir, CFG)
    merge_events(table, spark.createDataFrame(events, EVENT_SCHEMA), CFG, epoch=("t", 0))
    compact_deltas(table, delta_share=0.0)
    # verbatim re-delivery of the pre-delete events only
    redelivered = spark.createDataFrame(events[events.lsn.isin([3, 7])], EVENT_SCHEMA)
    merge_events(table, redelivered, CFG, epoch=("t", 1))

    row = table.read().collect()[0].asDict()
    assert row["lang"] is None, "erased column resurrected by re-delivery"
    assert row["content"] == "seed"
    assert row["last_lsn"] == 13
    assert row["row_version"] == 4


def test_mor_compaction_is_threshold_driven_per_bucket(spark, tmp_table_dir):
    """compact_deltas(delta_share=s): only buckets whose delta share
    crosses s rewrite; a cold bucket's base files stay byte-identical on
    disk and its delta rows keep resolving at read."""
    import pandas as pd

    from pyspark.sql import functions as F

    from etl_kafka_project_spark.cdc.mor import compact_deltas

    cfg = EngineConfig(n_buckets=2)
    table = create_code_table(spark, tmp_table_dir, cfg)
    # sort candidate keys into the 2 buckets
    cand = [f"r{i}" for i in range(20)]
    bdf = spark.createDataFrame([(r, "p") for r in cand], "repo string, path string")
    bucket_of = {
        r["repo"]: r["b"]
        for r in bdf.withColumn("b", F.pmod(F.hash("repo", "path"), F.lit(2))).collect()
    }
    cold_keys = [r for r in cand if bucket_of[r] == 0][:10]
    hot_key = next(r for r in cand if bucket_of[r] == 1)

    def ev(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "lsn": pd.array([r[0] for r in rows], dtype="Int64"),
                    "op": [r[1] for r in rows],
                    "ts": pd.to_datetime(["2026-01-01"] * len(rows)),
                    "repo": [r[2] for r in rows],
                    "path": ["p"] * len(rows),
                    "commit": [f"c{r[0]}" for r in rows],
                    "lang": ["rust"] * len(rows),
                    "content": [f"body{r[0]}" for r in rows],
                }
            ),
            EVENT_SCHEMA,
        )

    # epoch 0: seed both buckets, full-compact to base
    seed = [(i, "I", k) for i, k in enumerate([*cold_keys, hot_key])]
    merge_events(table, ev(seed), cfg, epoch=("t", 0))
    assert compact_deltas(table, delta_share=0.0)["compacted"]

    # epoch 1: heavy churn on the hot key, one touch on a cold key
    churn = [(100 + i, "U", hot_key) for i in range(5)] + [(200, "U", cold_keys[0])]
    merge_events(table, ev(churn), cfg, epoch=("t", 1))

    snap = table.snapshot()
    cold_base_before = sorted(
        f.path for f in snap.files if f.kind == "base" and f.bucket == 0
    )
    res = compact_deltas(table, delta_share=0.3)
    # hot bucket (share 1/2 >= 0.3) compacts; cold (1/11) skipped
    assert res["compacted"] and res["buckets"] == 1 and res["cold_buckets_skipped"] == 1
    snap2 = table.snapshot()
    assert sorted(
        f.path for f in snap2.files if f.kind == "base" and f.bucket == 0
    ) == cold_base_before
    assert any(f.kind == "delta" and f.bucket == 0 for f in snap2.files)
    assert not any(f.kind == "delta" and f.bucket == 1 for f in snap2.files)
    # the cold delta still resolves at read
    got = {r["repo"]: r for r in table.read().collect()}
    assert got[cold_keys[0]]["commit"] == "c200"
    assert got[hot_key]["commit"] == "c104"


def test_concurrent_merge_writers_conflict_then_retry(spark, tmp_table_dir):
    """Two writers merging from the same parent snapshot: commits
    serialize via optimistic concurrency — a loser (if the race
    materializes) raises SnapshotConflictError and its RETRY lands
    cleanly; the final state always contains both writers' keys."""
    import threading

    import pandas as pd

    from etl_kafka_project_spark.minilake.table import SnapshotConflictError

    table = create_code_table(spark, tmp_table_dir, CFG)

    def batch(repo, lsn0):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "lsn": pd.array([lsn0, lsn0 + 1], dtype="Int64"),
                    "op": ["I", "U"],
                    "ts": pd.to_datetime(["2026-01-01"] * 2),
                    "repo": [repo] * 2,
                    "path": ["p"] * 2,
                    "commit": [f"c{lsn0}", f"c{lsn0 + 1}"],
                    "lang": ["rust"] * 2,
                    "content": ["b1", "b2"],
                }
            ),
            EVENT_SCHEMA,
        )

    batches = {"wa": batch("repo-a", 10), "wb": batch("repo-b", 20)}
    failures: dict[str, BaseException] = {}

    def run(tag: str) -> None:
        try:
            merge_events(table, batches[tag], CFG, epoch=(tag, 0))
        except BaseException as e:  # record — thread exceptions vanish
            failures[tag] = e

    threads = [threading.Thread(target=run, args=(t,)) for t in batches]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    # commits serialized: at most one writer lost the race, and the ONLY
    # acceptable failure mode is the optimistic-concurrency conflict
    assert len(failures) <= 1, failures
    assert all(isinstance(e, SnapshotConflictError) for e in failures.values()), failures
    for tag in failures:  # the loser's retry sees the new snapshot and lands
        merge_events(table, batches[tag], CFG, epoch=(tag, 0))

    rows = {r["repo"]: r for r in table.read().collect()}
    assert rows["repo-a"]["commit"] == "c11" and rows["repo-a"]["row_version"] == 2
    assert rows["repo-b"]["commit"] == "c21" and rows["repo-b"]["row_version"] == 2
