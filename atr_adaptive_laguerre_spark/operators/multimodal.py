"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats media as ``binary`` columns with a metadata struct; the pipeline
pieces that matter at scale — schema, partitioning, Arrow batch shape,
vectorized byte-level feature extraction — are real and tested.  The
actual image/audio decode is stubbed (decoder libs are not available in
this environment): :func:`decode_stub` raises ``NotImplementedError``
with the would-be call, while :func:`byte_features` provides the
deterministic byte-level featurizer (length, entropy-proxy histogram
stats, checksum) used by the query below.

The demo derives a binary payload from ``documents.text`` (UTF-8 bytes),
so the computation is engine-portable and oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _r6(col):
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def with_media_column(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column + metadata struct (the multimodal
    table shape: payload stays opaque, metadata is typed and prunable)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("media"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("media_meta"))


def decode_stub(media_bytes: bytes, mime: str) -> np.ndarray:
    """Placeholder for a real decoder (PIL/librosa/ffmpeg are not in this
    container).  The Spark-side plumbing calls :func:`byte_features`
    instead; swap this in when decoders are available."""
    raise NotImplementedError(
        f"media decode for {mime!r} requires a codec library; "
        "wire PIL.Image.open / librosa.load / av.open here")


def byte_features(media: np.ndarray) -> dict[str, np.ndarray]:
    """Vectorized byte-level features for a batch of binary payloads:
    length, mean byte value, distinct-byte count (entropy proxy)."""
    lens = np.fromiter((len(b) for b in media), dtype=np.int64,
                       count=len(media))
    means = np.empty(len(media))
    distinct = np.empty(len(media), dtype=np.int64)
    for i, b in enumerate(media):
        arr = np.frombuffer(b, dtype=np.uint8)
        means[i] = arr.mean() if len(arr) else 0.0
        distinct[i] = len(np.unique(arr))
    return {"n_bytes": lens, "mean_byte": means, "distinct_bytes": distinct}


def media_features(media_df: DataFrame) -> DataFrame:
    """mapInPandas featurizer over the binary column — the real batch
    shape a decode UDF would use (Arrow binary arrays in, doubles out)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = byte_features(pdf["media"].to_numpy())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_bytes": feats["n_bytes"],
                "mean_byte": feats["mean_byte"],
                "distinct_bytes": feats["distinct_bytes"],
            })

    return media_df.mapInPandas(
        run, schema="doc_id bigint, n_bytes bigint, mean_byte double, "
                    "distinct_bytes bigint")


def q_multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: attach media payload + metadata, extract
    byte-level features via the Arrow batch featurizer."""
    media = with_media_column(_docs(spark, sf_dir))
    feats = media_features(media)
    return (feats.select("doc_id", "n_bytes",
                         _r6(F.col("mean_byte")).alias("mean_byte"),
                         "distinct_bytes")
            .orderBy("doc_id"))


# The corpus is ASCII text, so byte semantics == character semantics and
# DuckDB can replicate the featurizer with string ops.
ORACLE_MULTIMODAL_BYTE_STATS = """
WITH chars AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
         unnest(string_split(text, '')) AS ch
  FROM documents
)
SELECT doc_id,
       MAX(n_bytes) AS n_bytes,
       FLOOR(AVG(unicode(ch)::DOUBLE) * 1000000 + 0.5) / 1000000
         AS mean_byte,
       COUNT(DISTINCT ch) AS distinct_bytes
FROM chars
GROUP BY doc_id
ORDER BY doc_id
"""


QUERIES = {
    "multimodal_byte_stats": q_multimodal_byte_stats,
}

ORACLES = {
    "multimodal_byte_stats": ORACLE_MULTIMODAL_BYTE_STATS,
}
