"""Multimodal column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata.

This container has no codec libraries (PIL/ffmpeg/librosa), so the
*decode* step is a clearly-marked stub — but everything Spark-side is
real and tested: the binary packing, the metadata schema, the
``mapInPandas`` batch shape (Arrow batches of bytes → vectorized numpy),
and the partitioning story (binary payloads ride the same hash-bucket
layout as any other column; feature extraction is embarrassingly
parallel map work with NO shuffle).

``documents.text`` stands in for the raw media bytes via utf-8 packing,
which keeps every step deterministic and oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_kafka_project_spark.ops import load


def pack_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pack a payload column into (payload binary, meta struct) — the
    multimodal storage shape: opaque bytes + typed metadata."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "meta",
        F.struct(
            F.octet_length(F.col("payload")).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
            F.lit("utf-8").alias("encoding"),
        ),
    )


def decode_image(payload: bytes) -> "object":
    """Real media decode — NOT IMPLEMENTED in this container (no codec
    libs). The Spark-side plumbing around it is real; swap this single
    function for PIL/ffmpeg on a cluster with the libs installed."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this sandbox"
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def extract_binary_features(df: DataFrame) -> DataFrame:
    """Vectorized feature extraction over binary payloads via
    ``mapInPandas`` — Arrow ships whole batches of bytes to one Python
    call (never per-row). The features here are a deterministic fake
    (byte statistics) standing in for image-embedding extraction."""

    def batch_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype(
                        "int32"
                    ),
                    # unrounded: the byte sum is an exact integer in
                    # float64 and both engines divide the same operands,
                    # so the doubles are bit-identical — rounding would
                    # ADD a tie-breaking hazard (banker's vs half-away)
                    "mean_byte": payloads.map(
                        lambda b: float(np.frombuffer(b, dtype=np.uint8).sum(dtype="int64"))
                        / len(b)
                        if len(b)
                        else 0.0
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batch_features, _FEATURE_SCHEMA)


N_FRAMES = 4

_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("byte_val", T.IntegerType()),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = N_FRAMES) -> DataFrame:
    """Frame sampling over opaque binary payloads — the video-pipeline
    shape (decode → sample every Nth frame) with a deterministic fake
    "frame": the byte at offset ``floor(i * n_bytes / n_frames)``. The
    per-payload Python loop stands in for per-payload codec work (frame
    extraction IS per-payload); batches still ride Arrow via
    ``mapInPandas``, map-only, no shuffle — swap the body for
    ffmpeg/PyAV on a cluster with the libs installed."""

    def batch_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids: list[int] = []
            idxs: list[int] = []
            offs: list[int] = []
            vals: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for i in range(n_frames):
                    off = (i * n) // n_frames
                    if off < n:
                        doc_ids.append(doc_id)
                        idxs.append(i)
                        offs.append(off)
                        vals.append(payload[off])
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(doc_ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "offset": pd.array(offs, dtype="int32"),
                    "byte_val": pd.array(vals, dtype="int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batch_frames, _FRAME_SCHEMA)


def sample_frames_builtin(df: DataFrame, n_frames: int = N_FRAMES) -> DataFrame:
    """The pure-expression twin of ``sample_frames``: explode(sequence)
    × floor-div offset × substring/ascii on the binary payload — whole-
    stage-codegen JVM work, zero Python. For the byte-offset stand-in
    this IS the right production plan; ``sample_frames``' mapInPandas
    body exists to model per-payload CODEC work (real frame extraction
    can't be a SQL expression). A pinned test asserts both return
    identical rows, proving the Python loop is a codec placeholder, not
    a semantic dependency."""
    n = F.octet_length("payload")
    d = df.select(
        "doc_id",
        "payload",
        n.alias("_n"),
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx"),
    ).withColumn(
        "offset", F.floor(F.col("frame_idx") * F.col("_n") / F.lit(n_frames)).cast("int")
    )
    return (
        d.filter(F.col("offset") < F.col("_n"))
        .withColumn(
            "byte_val",
            F.expr("ascii(decode(substring(payload, offset + 1, 1), 'UTF-8'))").cast("int"),
        )
        .select("doc_id", F.col("frame_idx").cast("int").alias("frame_idx"), "offset", "byte_val")
    )


def multimodal_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Frame sampling as an oracle-checked query (ASCII payloads make
    the sampled byte SQL-expressible as a codepoint)."""
    return sample_frames(pack_binary(load(spark, sf, "documents")))


def multimodal_frame_sample_builtin(spark: SparkSession, sf: str) -> DataFrame:
    """Frame sampling via built-in expressions only (same oracle as the
    mapInPandas form) — the plan to ship when the 'frame' really is a
    byte offset; see ``sample_frames_builtin``."""
    return sample_frames_builtin(pack_binary(load(spark, sf, "documents")))


MULTIMODAL_FRAMES_SQL = f"""
WITH b AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
)
SELECT doc_id,
       CAST(t.range AS INTEGER) AS frame_idx,
       CAST((t.range * n) // {N_FRAMES} AS INTEGER) AS offset,
       CAST(ascii(substr(text, CAST((t.range * n) // {N_FRAMES} AS INTEGER) + 1, 1))
            AS INTEGER) AS byte_val
FROM b, range(0, {N_FRAMES}) t
WHERE (t.range * n) // {N_FRAMES} < n
"""


def multimodal_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Metadata projection of packed binary payloads (oracle-checkable:
    byte length and first code point survive the utf-8 round trip)."""
    d = pack_binary(load(spark, sf, "documents"))
    return d.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        F.ascii(F.substring("text", 1, 1)).alias("first_char_code"),
    )


MULTIMODAL_META_SQL = """
SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       'text/plain' AS mime,
       ascii(substr(text, 1, 1)) AS first_char_code
FROM documents
"""


def multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """Pandas-UDF feature extraction via ``mapInPandas`` — value-checked
    against a DuckDB oracle: the payloads are utf-8-packed ASCII text, so
    byte stats are expressible SQL-side as codepoint stats (verified
    octet_length(encode(text)) == len(text) on all testdata sfs)."""
    return extract_binary_features(pack_binary(load(spark, sf, "documents")))


MULTIMODAL_FEATURES_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       CAST(CASE WHEN len(text) = 0 THEN -1
                 ELSE ascii(substr(text, 1, 1)) END AS INTEGER) AS first_byte,
       CASE WHEN len(text) = 0 THEN 0.0
            ELSE list_sum(list_transform(range(1, len(text) + 1),
                                         i -> ascii(text[i])))
                 / CAST(len(text) AS DOUBLE) END AS mean_byte
FROM documents
"""


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_features": multimodal_features,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_frame_sample_builtin": multimodal_frame_sample_builtin,
}

ORACLES = {
    "multimodal_meta": MULTIMODAL_META_SQL,
    "multimodal_features": MULTIMODAL_FEATURES_SQL,
    "multimodal_frame_sample": MULTIMODAL_FRAMES_SQL,
    "multimodal_frame_sample_builtin": MULTIMODAL_FRAMES_SQL,
}
