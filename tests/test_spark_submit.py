"""North rule: "the job runs via spark-submit --py-files". Packages the
engine into a zip, runs the replay through the real spark-submit binary
at two parallelism levels against the same input, and checks the final
table equals the oracle both times."""

import json
import os
import shutil
import subprocess

import pandas as pd
import pytest

from etl_kafka_project_spark.cdc.fixtures import StreamSpec, generate_stream
from etl_kafka_project_spark.cdc.oracle import replay_oracle
from etl_kafka_project_spark.minilake.table import LakeTable
from tools.package import build

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit binary")
def test_submit_with_pyfiles_two_parallelism_levels(spark, tmp_path):
    spec = StreamSpec(n_events=1000, n_keys=150, n_segments=4, min_lines=2, max_lines=3)
    events, _ = generate_stream(str(tmp_path / "stream"), spec)
    zip_path = build(str(tmp_path / "dist"))

    outs = {}
    for cpus in (2, 8):
        table_root = str(tmp_path / f"table{cpus}")
        cmd = [
            SPARK_SUBMIT, "--master", f"local[{cpus}]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_replay.py"),
            "--table-root", table_root,
            "--stream-dir", str(tmp_path / "stream"),
            "--checkpoint", str(tmp_path / f"ckpt{cpus}"),
            "--create", "--n-buckets", "8", "--max-files-per-trigger", "2",
        ]
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
        assert res.returncode == 0, res.stderr[-2000:]
        outs[cpus] = json.loads(res.stdout.strip().splitlines()[-1])
        assert outs[cpus]["events"] == spec.n_events
        assert outs[cpus]["parallelism"] == cpus

        cols = ["repo", "path", "commit", "lang", "content",
                "content_sha256", "last_lsn", "row_version"]
        got = (
            LakeTable(spark, table_root).read().select(*cols).toPandas()
            .sort_values(["repo", "path"]).reset_index(drop=True)
        )
        want = replay_oracle(events).reindex(columns=cols)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
