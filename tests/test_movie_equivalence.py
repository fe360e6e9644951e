"""Reference-semantics equivalence fixture (FIXTURES.md §4, SURVEY §5.2.2):
a movie-shaped two-topic stream replayed through the engine reproduces the
reference's ``edit_row_and_visualize`` behavior — column-granular non-null
LWW, touch_counter, emit-on-completion + tombstone, enrichment joins,
null→'None' sink fill."""

import pandas as pd
import pytest

from etl_kafka_project_spark.compat.movies import MOVIE_CONFIG, run_movie_pipeline


@pytest.fixture(scope="module")
def fixture_frames(spark):
    # tmdb: (seq, imdb_id, movie_name, rating); omdb: (seq, imdb_id,
    # release_date, directors). tt3 only in tmdb; tt4 only in omdb
    # (incomplete — never emitted). tt5: tmdb rating null (null doesn't
    # overwrite); both sources → emitted.
    tmdb = spark.createDataFrame(
        pd.DataFrame(
            {
                "seq": [1, 2, 3, 4],
                "imdb_id": ["tt1", "tt2", "tt3", "tt5"],
                "movie_name": ["Alpha", "Beta", "Gamma", "Epsilon"],
                "rating": ["8", "7", "9", None],
            }
        )
    )
    omdb = spark.createDataFrame(
        pd.DataFrame(
            {
                "seq": [1, 2, 3, 4],
                "imdb_id": ["tt2", "tt1", "tt4", "tt5"],
                "release_date": ["1999", "2001", "2005", "2010"],
                "directors": ["D2", "D1", "D4", "D5"],
            }
        )
    )
    genres = spark.createDataFrame(
        pd.DataFrame({"imdb_id": ["tt1", "tt1", "tt2"], "genre": ["Drama", "War", "Comedy"]})
    )
    actors = spark.createDataFrame(
        pd.DataFrame({"FilmID": ["tt1", "tt1", "tt5"], "Actor": ["A1", "A2", "A5"]})
    )
    oscars = spark.createDataFrame(
        pd.DataFrame({"film": ["Alpha", "Alpha", "Beta"], "category": ["Best Picture", "Best Sound", "Best Actor"]})
    )
    baftas = spark.createDataFrame(
        pd.DataFrame({"nominee": ["Alpha", "Epsilon"], "category": ["Best Film", "Best Director"]})
    )
    return tmdb, omdb, genres, actors, oscars, baftas


@pytest.fixture(scope="module")
def result(spark, fixture_frames, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("movies") / "table")
    emitted, table = run_movie_pipeline(spark, root, *fixture_frames, config=MOVIE_CONFIG)
    em = {r["imdb_id"]: r.asDict() for r in emitted.collect()}
    return em, table


def test_emit_on_completion_and_tombstone(spark, result):
    em, table = result
    # only keys touched by BOTH sources emit (touch_counter == 2)
    assert set(em) == {"tt1", "tt2", "tt5"}
    # emitted keys are tombstoned out of state; incomplete keys remain
    remaining = {r["imdb_id"]: r for r in table.read().collect()}
    assert set(remaining) == {"tt3", "tt4"}
    assert all(r["row_version"] == 1 for r in remaining.values())
    # tombstones exist physically until compaction
    tombs = table.read(include_tombstones=True).filter("_deleted").count()
    assert tombs == 3


def test_column_granular_non_null_merge(result):
    em, _ = result
    # fields from the two sources combine per key
    assert em["tt1"]["movie_name"] == "Alpha" and em["tt1"]["directors"] == "D1"
    assert em["tt2"]["rating"] == "7" and em["tt2"]["release_date"] == "1999"
    # tt5: tmdb sent rating=None — null must NOT overwrite, and with no
    # other writer the field stays null → 'None' after sink fill
    assert em["tt5"]["rating"] == "None"
    assert em["tt5"]["directors"] == "D5"


def test_enrichment_joins(result):
    em, _ = result
    # genre: FIRST match only (genre_handler.py:27)
    assert em["tt1"]["genres"] == "Drama"
    # actors: all matches ', '-joined (actor_handler.py:26)
    assert em["tt1"]["lead_actors"] == "A1, A2"
    # awards: oscar then bafta concat (api_entity_handler.py:69-84)
    assert em["tt1"]["awards"] == "Best Picture, Best Sound, Best Film"
    assert em["tt2"]["awards"] == "Best Actor"
    assert em["tt5"]["awards"] == "Best Director"


def test_null_fill_at_sink(result):
    em, _ = result
    # no genre/actor dims matched tt2's id beyond genre → 'None' fill
    # (redis_interface.py:63-74)
    assert em["tt2"]["lead_actors"] == "None"
    assert all(v is not None for row in em.values() for v in row.values())
