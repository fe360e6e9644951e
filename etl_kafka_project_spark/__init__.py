"""etl_kafka_project_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of the reference
``ShalevS343/etl-kafka-project`` (a Kafka→pandas→row-at-a-time-PySpark→Redis
movie ETL) as an idiomatic Spark engine:

* binlog/WAL-shaped change stream of ``(lsn, op, ts, repo, path, commit,
  lang, content)`` events (the Kafka-topic analog,
  reference ``utils/interfaces/kafka_interface.py:24-81``),
* applied by key-partitioned MERGE upserts with last-writer-wins on a
  monotonic LSN (the analog of ``pyspark_interface.py:38-95``'s per-message
  keyed state surgery),
* into an Iceberg-shaped lake table (``minilake``) — parquet data files
  bucketed by key hash + an atomic JSON snapshot log with schema evolution
  and committed-epoch tracking,
* through Structured Streaming ``foreachBatch`` with idempotent
  epoch-stamped commits (exactly-once), checkpoint/resume, per-partition
  lineage + throughput metrics,
* with vectorized pandas/Arrow UDFs only (no per-row Python UDFs).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
