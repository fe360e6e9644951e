"""Structured Streaming replay: end-to-end equivalence, exactly-once epoch
idempotence, kill-and-resume, dead-letter quarantine (SURVEY §5.2.1/4/6)."""

import os

import pandas as pd
import pytest

from etl_kafka_project_spark.cdc.envelope import EVENT_SCHEMA
from etl_kafka_project_spark.cdc.fixtures import StreamSpec, generate_stream, space_mtimes
from etl_kafka_project_spark.cdc.merge import create_code_table
from etl_kafka_project_spark.cdc.metrics import LineageLog
from etl_kafka_project_spark.cdc.oracle import replay_oracle
from etl_kafka_project_spark.cdc.stream import ReplayJob
from etl_kafka_project_spark.config import EngineConfig

CFG = EngineConfig(n_buckets=8)


def _final_state_pdf(table):
    cols = ["repo", "path", "commit", "lang", "content", "content_sha256", "last_lsn", "row_version"]
    return table.read().select(*cols).toPandas().sort_values(["repo", "path"]).reset_index(drop=True)


def _job(tmp_path, **kw):
    return ReplayJob(
        table_root=str(tmp_path / "table"),
        stream_dir=str(tmp_path / "stream"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        config=CFG,
        **kw,
    )


def test_streaming_replay_matches_oracle(spark, tmp_path):
    spec = StreamSpec(n_events=1200, n_keys=150, n_segments=6, min_lines=2, max_lines=4)
    events, _ = generate_stream(str(tmp_path / "stream"), spec)
    create_code_table(spark, str(tmp_path / "table"), CFG)

    job = _job(tmp_path, max_files_per_trigger=2)
    stats = job.run(spark)
    assert len(stats) >= 3  # bounded triggers → multiple epochs
    assert all(not s.skipped for s in stats)

    got = _final_state_pdf(_open(spark, job))
    want = replay_oracle(events).reindex(columns=got.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # lineage: one doc per epoch, events_in sums to events incl. duplicates
    docs = LineageLog(job.lineage_dir, job.stream_id).read_all()
    assert len(docs) == len(stats)
    assert all(d["events_per_sec"] is not None for d in docs if d["events_in"])


def _open(spark, job):
    from etl_kafka_project_spark.minilake.table import LakeTable

    return LakeTable(spark, job.table_root)


def test_epoch_replay_is_skipped(spark, tmp_path):
    """Crash-retry of a committed epoch must be a no-op (exactly-once)."""
    spec = StreamSpec(n_events=300, n_keys=40, n_segments=2, min_lines=2, max_lines=3)
    events, segs = generate_stream(str(tmp_path / "stream"), spec)
    create_code_table(spark, str(tmp_path / "table"), CFG)
    job = _job(tmp_path)

    batch = spark.read.schema(EVENT_SCHEMA).parquet(segs[0])
    s1 = job.apply_epoch(batch, 0)
    assert not s1.skipped
    before = _final_state_pdf(_open(spark, job))
    v_before = _open(spark, job).current_version()

    s2 = job.apply_epoch(batch, 0)  # simulated foreachBatch retry
    assert s2.skipped
    assert _open(spark, job).current_version() == v_before
    pd.testing.assert_frame_equal(before, _final_state_pdf(_open(spark, job)))


def test_kill_and_resume(spark, tmp_path):
    """Stop the stream mid-replay, restart from checkpoint: no lost or
    duplicated effects; final state equals the oracle."""
    spec = StreamSpec(n_events=1000, n_keys=120, n_segments=8, min_lines=2, max_lines=3)
    events, _ = generate_stream(str(tmp_path / "stream"), spec)
    create_code_table(spark, str(tmp_path / "table"), CFG)

    # phase 1: apply only part of the backlog, then "crash"
    job1 = _job(tmp_path, max_files_per_trigger=2)
    q = job1.start(spark, available_now=True)
    while q.isActive and len(job1.applied) < 2:
        q.awaitTermination(0.2)
    q.stop()
    q.awaitTermination()
    applied_before = len(job1.applied)
    assert 0 < applied_before  # partial progress happened

    # phase 2: fresh driver object, same checkpoint → resume
    job2 = _job(tmp_path, max_files_per_trigger=2)
    job2.run(spark)

    got = _final_state_pdf(_open(spark, job2))
    want = replay_oracle(events).reindex(columns=got.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # row_version is the per-key applied-event count: any double-apply
    # would inflate it past the oracle's — already covered by frame
    # equality, spelled out here for the kill-resume contract
    assert got["row_version"].sum() == want["row_version"].sum()


def test_dead_letters_quarantined(spark, tmp_path):
    spec = StreamSpec(n_events=200, n_keys=30, n_segments=1, dup_rate=0.0, min_lines=2, max_lines=3)
    events, _ = generate_stream(str(tmp_path / "stream"), spec)
    create_code_table(spark, str(tmp_path / "table"), CFG)
    job = _job(tmp_path)

    corrupt = pd.DataFrame(
        {
            "lsn": pd.array([None, 99991, 99992, 99993], dtype="Int64"),
            "op": ["I", "X", "I", "I"],
            "ts": pd.Timestamp("2024-01-01", tz="UTC"),
            "repo": ["r", "r", None, "r"],
            "path": ["p", "p", "p", "p"],
            "commit": ["c"] * 4,
            "lang": ["py"] * 4,
            "content": ["x", "x", "x", None],
        }
    )
    noisy = pd.concat([events, corrupt], ignore_index=True)
    stats = job.apply_epoch(spark.createDataFrame(noisy, EVENT_SCHEMA), 0)
    assert stats.events_in == len(events)

    dead = spark.read.parquet(os.path.join(job.dead_letter_dir, "epoch=0"))
    reasons = {r["_dead_reason"] for r in dead.select("_dead_reason").collect()}
    assert reasons == {"null_lsn", "bad_op", "null_key", "null_content"}
    assert dead.count() == 4

    got = _final_state_pdf(_open(spark, job))
    want = replay_oracle(events).reindex(columns=got.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_incompatible_column_dead_letters(spark, tmp_path):
    """A payload column arriving with an incompatible type (lang as long
    where the table stores string) must dead-letter its non-null carriers
    whole-row with reason ``incompatible_type:<col>`` and merge the rest
    with the column treated as absent — never a silent cast (string→int
    would null-fill, int→string would stringify). SURVEY §4.2 item 4."""
    import datetime

    from pyspark.sql import types as T

    create_code_table(spark, str(tmp_path / "table"), CFG)
    job = _job(tmp_path)
    ts = datetime.datetime(2024, 1, 1)
    schema = T.StructType(
        [
            T.StructField("lsn", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("commit", T.StringType()),
            T.StructField("lang", T.LongType()),  # table stores string
            T.StructField("content", T.StringType()),
        ]
    )
    rows = [
        (1, "I", ts, "r0", "a.py", "c1", 7, "body-a"),  # bad lang → dead
        (2, "I", ts, "r0", "b.py", "c2", None, "body-b"),  # null lang → applies
        (3, "U", ts, "r0", "c.py", None, 9, None),  # bad lang → dead
    ]
    stats = job.apply_epoch(spark.createDataFrame(rows, schema), 0)
    assert not stats.skipped

    # only the null-lang insert applied; lang never silently coerced
    state = _open(spark, job).read().toPandas()
    assert state["path"].tolist() == ["b.py"] and state["lang"].isna().all()
    # table schema unchanged: no incompatible ALTER ever commits
    assert (
        _open(spark, job).snapshot().schema["lang"].dataType == T.StringType()
    )

    dead = spark.read.parquet(os.path.join(job.dead_letter_dir, "epoch=0")).toPandas()
    assert sorted(dead["lsn"]) == [1, 3]
    assert set(dead["_dead_reason"]) == {"incompatible_type:lang"}
    docs = LineageLog(job.lineage_dir, job.stream_id).read_all()
    assert docs[-1]["dead_letters"] == {"incompatible_type:lang": 2}

    # steady state: the cached per-schema verdict quarantines epoch 1's
    # bad-lang update whole-row — its content must NOT half-apply
    rows2 = [(4, "U", ts, "r0", "b.py", None, 11, "body-b2")]
    job.apply_epoch(spark.createDataFrame(rows2, schema), 1)
    state2 = _open(spark, job).read().toPandas()
    assert state2["content"].tolist() == ["body-b"]
    dead2 = spark.read.parquet(os.path.join(job.dead_letter_dir, "epoch=1")).toPandas()
    assert dead2["lsn"].tolist() == [4]

    # crash-resume heal: quarantine lost → the retry rewrites it with
    # the incompatible rows included and still applies nothing (an
    # all-quarantined epoch folds empty, so no snapshot ever commits —
    # the retry is a natural no-op, same as an all-redelivered epoch)
    import shutil

    v_before = _open(spark, job).current_version()
    shutil.rmtree(os.path.join(job.dead_letter_dir, "epoch=1"))
    s3 = job.apply_epoch(spark.createDataFrame(rows2, schema), 1)
    assert s3.events_in == 0 and s3.keys == 0
    assert _open(spark, job).current_version() == v_before
    dead3 = spark.read.parquet(os.path.join(job.dead_letter_dir, "epoch=1")).toPandas()
    assert dead3["lsn"].tolist() == [4]
    assert set(dead3["_dead_reason"]) == {"incompatible_type:lang"}


def _dup_stream(tmp_path):
    """400 events in 2 segments + 20 of segment 0's events re-delivered
    verbatim as a third segment (the cross-epoch duplicate scenario)."""
    spec = StreamSpec(n_events=400, n_keys=60, n_segments=2, dup_rate=0.0,
                      shuffle_within_segment=False, min_lines=2, max_lines=3)
    events, segs = generate_stream(str(tmp_path / "stream"), spec)
    dup = pd.read_parquet(segs[0]).head(20)
    dup_path = str(tmp_path / "stream" / "segment-00002.parquet")
    dup.to_parquet(dup_path)
    # re-space ALL THREE mtimes: the dup is written after generate_stream
    # already spaced segs 0/1 five ms apart, so its natural mtime can land
    # BETWEEN them and the file source would deliver it as epoch 1
    space_mtimes(sorted(segs) + [dup_path])
    return events


def test_watermarked_cross_epoch_dedup(spark, tmp_path):
    """north star: dropDuplicates over watermarked state. A verbatim
    duplicate delivered in a LATER epoch (outside the per-batch fold's
    sight) must be dropped pre-merge. Default scope ("committed"): the
    persisted high-water-mark predicate does the dropping — no state
    store shuffle (round-3 verdict #3)."""
    events = _dup_stream(tmp_path)
    create_code_table(spark, str(tmp_path / "table"), CFG)
    job = _job(tmp_path, max_files_per_trigger=1, watermark="1 hour")
    stats = job.run(spark)
    assert len(stats) == 3
    assert stats[2].events_in == 0  # the re-delivered epoch applied nothing

    got = _final_state_pdf(_open(spark, job))
    want = replay_oracle(events).reindex(columns=got.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_watermarked_state_scope_dedup(spark, tmp_path):
    """watermark_scope="state": the literal dropDuplicatesWithinWatermark
    construct drops the re-delivered epoch inside the streaming graph —
    same observable result as the default committed scope."""
    events = _dup_stream(tmp_path)
    create_code_table(spark, str(tmp_path / "table"), CFG)
    job = _job(tmp_path, max_files_per_trigger=1, watermark="1 hour",
               watermark_scope="state")
    stats = job.run(spark)
    # the stateful graph (dropDuplicatesWithinWatermark) may append one
    # trailing NO-DATA batch under availableNow — Spark runs it to let
    # the advanced watermark evict state; it applies nothing
    assert len(stats) in (3, 4)
    assert all(s.events_in == 0 for s in stats[2:])

    got = _final_state_pdf(_open(spark, job))
    want = replay_oracle(events).reindex(columns=got.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_watermarked_hwm_survives_restart(spark, tmp_path):
    """committed-scope hwm persists next to the checkpoint: a NEW job
    object (process restart) resuming the same checkpoint still drops a
    duplicate segment delivered after the restart."""
    spec = StreamSpec(n_events=400, n_keys=60, n_segments=2, dup_rate=0.0,
                      shuffle_within_segment=False, min_lines=2, max_lines=3)
    events, segs = generate_stream(str(tmp_path / "stream"), spec)
    create_code_table(spark, str(tmp_path / "table"), CFG)

    job1 = _job(tmp_path, max_files_per_trigger=1, watermark="1 hour")
    assert len(job1.run(spark)) == 2
    assert os.path.exists(os.path.join(str(tmp_path / "ckpt"), "hwm.json"))

    # "restart": fresh driver-side job state, same checkpoint; the dupe
    # arrives only now, so Spark's offsets alone can't skip it
    dup = pd.read_parquet(segs[0]).head(20)
    dup.to_parquet(str(tmp_path / "stream" / "segment-00002.parquet"))
    job2 = _job(tmp_path, max_files_per_trigger=1, watermark="1 hour")
    stats = job2.run(spark)
    assert [s.events_in for s in stats if not s.skipped] == [0]

    got = _final_state_pdf(_open(spark, job2))
    want = replay_oracle(events).reindex(columns=got.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_expiry_housekeeping_cadence(spark, tmp_path):
    """expire_snapshots on the ReplayJob cadence: history past the
    retention window vanishes while the replay stays correct."""
    spec = StreamSpec(n_events=600, n_keys=80, n_segments=6, min_lines=2, max_lines=3)
    events, _ = generate_stream(str(tmp_path / "stream"), spec)
    create_code_table(spark, str(tmp_path / "table"), CFG)
    cfg = EngineConfig(
        n_buckets=CFG.n_buckets, expire_snapshots_every_epochs=2, expire_keep_last=2
    )
    job = ReplayJob(
        table_root=str(tmp_path / "table"),
        stream_dir=str(tmp_path / "stream"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        config=cfg,
        max_files_per_trigger=1,
    )
    stats = job.run(spark)
    assert len(stats) == 6

    table = _open(spark, job)
    current = table.current_version()
    snap_dir = os.path.join(str(tmp_path / "table"), "snapshots")
    versions = sorted(
        int(f[1:].split(".")[0]) for f in os.listdir(snap_dir)  # v{N}.json
    )
    # the newest expire pass ran at the last applied epoch that hit the
    # cadence; everything older than its keep_last=2 window is gone
    assert versions[-1] == current
    assert len(versions) <= 2 + 2  # keep window + epochs applied since

    docs = LineageLog(job.lineage_dir, job.stream_id).read_all()
    assert any(d.get("phases", {}).get("expire_snapshots_removed") for d in docs)

    got = _final_state_pdf(table)
    want = replay_oracle(events).reindex(columns=got.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_order_guard_trips_on_out_of_order_first_delivery(spark, tmp_path):
    """Delivery-contract guard: a FIRST delivery arriving below the
    applied high-water mark (e.g. a file source listing two
    same-millisecond segments out of log order) fails loud instead of
    silently mis-counting the late events as re-deliveries; verbatim
    re-delivery of an applied segment still passes, and
    order_guard='warn' records the violation without raising."""
    from etl_kafka_project_spark.cdc.stream import OutOfOrderDeliveryError

    spec = StreamSpec(n_events=400, n_keys=60, n_segments=4, min_lines=2, max_lines=3)
    _, segs = generate_stream(str(tmp_path / "stream"), spec)
    create_code_table(spark, str(tmp_path / "table"), CFG)
    read = lambda p: spark.read.schema(EVENT_SCHEMA).parquet(p)

    job = _job(tmp_path)
    job.apply_epoch(read(segs[0]), 0)
    job.apply_epoch(read(segs[2]), 1)  # skips segment 1: creates a gap
    with pytest.raises(OutOfOrderDeliveryError):
        job.apply_epoch(read(segs[1]), 2)  # gap-filling first delivery
    # verbatim re-delivery lies inside applied intervals — no trip
    job.apply_epoch(read(segs[0]), 3)
    # the violation is in the epoch's lineage doc either way
    doc = LineageLog(job.lineage_dir, job.stream_id).read_epoch(2)
    assert doc["phases"]["order_violation"][0] <= doc["phases"]["order_violation"][1]

    # warn mode: same shape records but does not raise
    cfg = EngineConfig(n_buckets=CFG.n_buckets, order_guard="warn")
    create_code_table(spark, str(tmp_path / "table2"), cfg)
    job2 = ReplayJob(
        table_root=str(tmp_path / "table2"),
        stream_dir=str(tmp_path / "stream"),
        checkpoint_dir=str(tmp_path / "ckpt2"),
        config=cfg,
    )
    job2.apply_epoch(read(segs[0]), 0)
    job2.apply_epoch(read(segs[2]), 1)
    job2.apply_epoch(read(segs[1]), 2)
    doc = LineageLog(job2.lineage_dir, job2.stream_id).read_epoch(2)
    assert "order_violation" in doc["phases"]

    # a fresh job over the same lineage rebuilds intervals on resume:
    # re-delivery of every applied segment still passes the guard
    job3 = ReplayJob(
        table_root=str(tmp_path / "table2"),
        stream_dir=str(tmp_path / "stream"),
        checkpoint_dir=str(tmp_path / "ckpt2"),
        config=cfg,
    )
    job3.apply_epoch(read(segs[2]), 3)
    doc = LineageLog(job3.lineage_dir, job3.stream_id).read_epoch(3)
    assert "order_violation" not in doc["phases"]


def test_rate_controlled_continuous_tail(spark, tmp_path):
    """T8: a processingTime-triggered CONTINUOUS tail (available_now=False)
    picks up segments that arrive over time and merges them correctly —
    the reference's EXTRACT_INTERVAL polling loop (config.py:13) as a
    rate-controlled Structured Streaming trigger."""
    import shutil
    import time

    spec = StreamSpec(n_events=900, n_keys=120, n_segments=6, min_lines=2, max_lines=3)
    events, segs = generate_stream(str(tmp_path / "staging"), spec)
    os.makedirs(str(tmp_path / "stream"))
    create_code_table(spark, str(tmp_path / "table"), CFG)

    job = _job(tmp_path, processing_interval="1 seconds")
    segs = sorted(segs)
    # half the backlog exists when the tail starts... (mtimes re-spaced:
    # a tight copy loop can land two segments in the same millisecond,
    # and the file source breaks mtime ties in arbitrary listing order —
    # an out-of-order delivery the engine's contract forbids)
    backlog = []
    for s in segs[:3]:
        backlog.append(shutil.copy(s, str(tmp_path / "stream")))
    space_mtimes(backlog)
    q = job.start(spark, available_now=False)
    try:
        deadline = time.time() + 60
        while not job.applied and time.time() < deadline:
            time.sleep(0.5)
        assert job.applied, "tail never applied the initial backlog"
        # ...the rest arrives late, while the query is running
        for s in segs[3:]:
            shutil.copy(s, str(tmp_path / "stream"))
            time.sleep(0.3)
        want = replay_oracle(events).reindex(
            columns=["repo", "path", "commit", "lang", "content",
                     "content_sha256", "last_lsn", "row_version"]
        )
        while time.time() < deadline:
            applied_events = sum(s.events_in for s in job.applied if not s.skipped)
            if applied_events >= events.lsn.nunique():
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert q.exception() is None
    assert len([s for s in job.applied if not s.skipped]) >= 2

    got = _final_state_pdf(_open(spark, job))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # the trigger really was processingTime (not one availableNow drain):
    # epochs were applied across distinct trigger firings
    docs = LineageLog(job.lineage_dir, job.stream_id).read_all()
    assert len(docs) == len(job.applied)
