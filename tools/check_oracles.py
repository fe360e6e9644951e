"""Driver-shaped oracle checker: run every ops query on Spark AND its
DuckDB oracle SQL, compare row count, column names, and order-insensitive
values (exact after the queries' own rounding). Usage:

    PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(columns=sorted(pdf.columns))
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(lambda v: str(v) if v is not None else None)
        else:
            try:
                pdf[c] = pd.to_numeric(pdf[c])
            except (ValueError, TypeError):
                pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), kind="stable").reset_index(drop=True)


def compare(name, spark_df, con, sql) -> str:
    got = normalize(spark_df.toPandas())
    want = normalize(con.execute(sql).df())
    if sorted(got.columns) != sorted(want.columns):
        return f"SCHEMA MISMATCH spark={sorted(got.columns)} duck={sorted(want.columns)}"
    if len(got) != len(want):
        return f"ROWCOUNT MISMATCH spark={len(got)} duck={len(want)}"
    try:
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    except AssertionError as e:
        # retry with tolerance to classify float-jitter vs real bugs
        try:
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, rtol=1e-6, atol=1e-9
            )
            return f"FLOAT JITTER (match at 1e-6): {str(e).splitlines()[0]}"
        except AssertionError:
            return f"VALUE MISMATCH: {str(e).splitlines()[-1][:160]}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    from etl_kafka_project_spark.session import build_session

    spark = build_session("local[8]", shuffle_partitions=8)
    con = duck_connection(sf_dir)
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            print(f"{name:35s} ROWS-ONLY ({n} rows)")
            continue
        try:
            verdict = compare(name, fn(spark, sf_dir), con, oracles[name])
        except Exception as e:  # noqa: BLE001
            verdict = f"ERROR {type(e).__name__}: {str(e).splitlines()[0][:200]}"
        if verdict != "OK":
            failures += 1
        print(f"{name:35s} {verdict}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
