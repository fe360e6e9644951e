"""Stateful streaming equivalence (SURVEY §2.8 T4/T5): the two-source
touch-counter merge as applyInPandasWithState — emit-on-2 + state drop —
driven by a real streaming query across multiple micro-batches."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_kafka_project_spark.compat.movies_streaming import streaming_touch_counter

SCHEMA = (
    "seq long, imdb_id string, movie_name string, rating string,"
    " release_date string, directors string"
)


@pytest.fixture()
def stream_dir(spark, tmp_path):
    """Two micro-batch files: tmdb-ish events first, omdb-ish second —
    completion happens across batch boundaries (state carries over)."""
    batch1 = pd.DataFrame(
        {
            "seq": [1, 2, 3],
            "imdb_id": ["tt1", "tt2", "tt3"],
            "movie_name": ["Alpha", "Beta", "Gamma"],
            "rating": ["8", None, "9"],
            "release_date": [None, None, None],
            "directors": [None, None, None],
        }
    )
    batch2 = pd.DataFrame(
        {
            "seq": [4, 5],
            "imdb_id": ["tt2", "tt1"],
            "movie_name": [None, None],
            "rating": [None, None],
            "release_date": ["1999", "2001"],
            "directors": ["D2", "D1"],
        }
    )
    d = tmp_path / "movie_stream"
    d.mkdir()
    spark.createDataFrame(batch1, SCHEMA).coalesce(1).write.parquet(str(d / "b1"))
    spark.createDataFrame(batch2, SCHEMA).coalesce(1).write.parquet(str(d / "b2"))
    return str(d)


def test_emit_on_second_source_across_batches(spark, stream_dir, tmp_path):
    events = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/b*")
    )
    q = (
        streaming_touch_counter(events)
        .writeStream.format("memory")
        .queryName("completed_movies")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {r["imdb_id"]: r.asDict() for r in spark.sql("select * from completed_movies").collect()}
    # both-sources keys emitted exactly once, with merged columns
    assert set(rows) == {"tt1", "tt2"}
    assert rows["tt1"]["movie_name"] == "Alpha" and rows["tt1"]["directors"] == "D1"
    assert rows["tt1"]["rating"] == "8" and rows["tt1"]["release_date"] == "2001"
    # tt2's tmdb rating was null — never overwritten, stays null at emit
    assert rows["tt2"]["rating"] is None and rows["tt2"]["release_date"] == "1999"
    assert all(r["touch_counter"] == 2 for r in rows.values())
    # tt3 saw only one source: still in state, NOT emitted
    assert "tt3" not in rows
