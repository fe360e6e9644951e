"""Vectorized scalar functions (pandas/Arrow UDFs + JVM built-ins only)."""

from etl_kafka_project_spark.functions.hashing import sha256_pandas, sha256_builtin

__all__ = ["sha256_pandas", "sha256_builtin"]
