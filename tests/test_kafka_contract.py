"""Kafka-seam contract test (round-5 VERDICT #9): no broker or
spark-sql-kafka jar exists in the sandbox, so the production source is
proven in two halves — ``test_sources.py::test_kafka_reader_builds_plan``
covers reader construction (skips without the jar), and THIS test covers
everything downstream of ``reader.load()``: a recorded frame shaped
byte-for-byte like ``format("kafka")`` output (key/value binary, topic,
partition, offset, timestamp, timestampType) flows through
``decode_kafka_frame`` → ``split_dead_letters`` → ``merge_events`` and
the final table state equals the replay oracle."""

import json
import os
import sys
from datetime import datetime, timezone

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_kafka_project_spark.cdc.envelope import split_dead_letters
from etl_kafka_project_spark.cdc.fixtures import StreamSpec, generate_events
from etl_kafka_project_spark.cdc.merge import create_code_table, merge_events
from etl_kafka_project_spark.cdc.oracle import replay_oracle
from etl_kafka_project_spark.cdc.sources import KAFKA_WIRE_SCHEMA, decode_kafka_frame
from etl_kafka_project_spark.config import EngineConfig


def _frames_from_events(events: pd.DataFrame) -> list[tuple]:
    """Serialize envelope rows exactly as the reference's producer would
    put them on the topic (kafka_interface.py:24-44: JSON value, keyed
    message): key = 'repo|path' bytes, value = JSON envelope bytes."""
    frames = []
    for i, r in events.reset_index(drop=True).iterrows():
        payload = {
            "lsn": int(r["lsn"]),
            "op": r["op"],
            "ts": r["ts"].isoformat() if pd.notna(r["ts"]) else None,
            "repo": r["repo"],
            "path": r["path"],
            "commit": None if pd.isna(r["commit"]) else r["commit"],
            "lang": None if pd.isna(r["lang"]) else r["lang"],
            "content": None if pd.isna(r["content"]) else r["content"],
        }
        frames.append(
            (
                f"{r['repo']}|{r['path']}".encode(),
                json.dumps(payload).encode(),
                "changes",
                int(i) % 4,
                int(i),
                datetime.now(timezone.utc),
                0,
            )
        )
    return frames


def test_recorded_kafka_frames_replay_to_oracle_state(spark, tmp_path):
    spec = StreamSpec(n_events=600, n_keys=80, n_segments=1, min_lines=1, max_lines=3)
    events = generate_events(spec)

    frames = _frames_from_events(events)
    # corrupt frames a real topic carries: non-JSON bytes and a null
    # value — both must dead-letter, never kill the stream or the merge
    frames.append((b"k", b"\x00\xffnot json", "changes", 0, len(frames), datetime.now(timezone.utc), 0))
    frames.append((b"k2", None, "changes", 1, len(frames), datetime.now(timezone.utc), 0))

    raw = spark.createDataFrame(frames, KAFKA_WIRE_SCHEMA)
    decoded = decode_kafka_frame(raw)
    # wire metadata survives as the source tag; envelope is fully typed
    assert decoded.schema["_source"].dataType.typeName() == "string"

    valid, dead = split_dead_letters(decoded.drop("_source"))
    n_dead = dead.count()
    assert n_dead >= 2  # at least the two corrupt frames
    reasons = {r["_dead_reason"] for r in dead.collect()}
    assert "null_lsn" in reasons  # from_json null-structs land here

    cfg = EngineConfig(n_buckets=8)
    table = create_code_table(spark, str(tmp_path / "table"), cfg)
    stats = merge_events(table, valid, cfg, epoch=("kafka-contract", 0))
    assert stats.events_in == valid.count()

    got = (
        table.read()
        .select("repo", "path", "commit", "lang", "content", "content_sha256")
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    want = replay_oracle(events)[got.columns].sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_decode_matches_wire_schema_exactly(spark):
    """The pinned KAFKA_WIRE_SCHEMA is the contract: decoding must use
    only columns format('kafka') actually emits, and tolerate all of
    them being present (select-star regressions would break here)."""
    raw = spark.createDataFrame([], KAFKA_WIRE_SCHEMA)
    out = decode_kafka_frame(raw)
    assert set(out.columns) == {
        "lsn", "op", "ts", "repo", "path", "commit", "lang", "content", "_source",
    }
    assert out.count() == 0
