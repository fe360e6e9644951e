"""Content hashing — the per-row invariant of the engine.

BASELINE.json input_hint requires a *vectorized pandas/Arrow UDF* computing
``sha256(content)`` whose output byte-equals the reference pipeline's final
state. Two implementations are provided and cross-checked equal in tests:

* :func:`sha256_builtin` — ``F.sha2(col, 256)``, JVM-side, whole-stage
  codegen, the hot path used inside the MERGE;
* :func:`sha256_pandas` — an Arrow-batched pandas UDF (the contract's
  literal requirement), used by the verification/equivalence suite.

No row-at-a-time Python UDFs anywhere (input_hint: "no per-row Python" —
the pandas UDF receives whole Arrow batches; the per-element hashlib loop
runs over a materialized batch inside one Python call, not one call per
row through serde).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sha256_builtin(col: str | Column) -> Column:
    """JVM-side sha256 hex digest of a string column (null-safe)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)


def _sha256_series(s: pd.Series) -> pd.Series:
    return s.map(
        lambda x: hashlib.sha256(x.encode("utf-8")).hexdigest() if x is not None else None
    )


# DataType (not DDL string) return type: registrable without an active session
_sha256_udf = F.pandas_udf(_sha256_series, T.StringType())


def sha256_pandas(col: str | Column) -> Column:
    """Arrow-batched pandas-UDF sha256 hex digest (contract invariant)."""
    c = F.col(col) if isinstance(col, str) else col
    return _sha256_udf(c)
