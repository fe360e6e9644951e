"""Driver-side units that need no Spark session: write-split planning
(cdc/salting.py) and lineage documents (cdc/metrics.py)."""

import json
import os

from etl_kafka_project_spark.cdc.merge import MergeStats
from etl_kafka_project_spark.cdc.metrics import LineageLog
from etl_kafka_project_spark.cdc.salting import plan_write_splits


def test_plan_write_splits_hot_bucket_fans_out():
    splits = plan_write_splits({0: 10_000_000, 1: 50_000, 2: 0}, target_file_rows=1_000_000)
    assert splits == {0: 10, 1: 1, 2: 1}


def test_plan_write_splits_clamps():
    splits = plan_write_splits({0: 10**12}, target_file_rows=1_000_000, max_splits=64)
    assert splits[0] == 64
    assert plan_write_splits({0: 1}, target_file_rows=0)[0] >= 1


def _stats(epoch_id=7):
    return MergeStats(
        epoch_id=epoch_id, events_in=1000, keys=900, upserts=850, deletes=50,
        touched_buckets=8, wall_ms=1234.5,
        per_bucket=[{"_bucket": 0, "keys": 900, "deletes": 50, "events": 1000,
                     "min_lsn": 1, "max_lsn": 1000}],
        snapshot_version=3,
    )


def test_lineage_record_roundtrip(tmp_path):
    log = LineageLog(str(tmp_path / "lineage"), stream_id="s1")
    doc = log.record(_stats(), dead_letters={"bad_op": 2})
    assert doc["epoch"] == 7 and doc["events_per_sec"] is not None
    assert doc["dead_letters"] == {"bad_op": 2}

    # crash-retry overwrite: same epoch file, exactly one document
    log.record(_stats(), skipped=True)
    docs = log.read_all()
    assert len(docs) == 1 and docs[0]["skipped"] is True

    # on-disk doc is plain JSON with per-bucket lineage
    raw = json.load(open(os.path.join(str(tmp_path / "lineage"), "epoch-0000000007.json")))
    assert raw["per_bucket"][0]["max_lsn"] == 1000
