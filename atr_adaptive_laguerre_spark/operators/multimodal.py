"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats media as ``binary`` columns with a metadata struct; the pipeline
pieces that matter at scale — schema, partitioning, Arrow batch shape,
vectorized feature extraction — are real and tested, and so is the
decode step: pure-numpy decoders for the uncompressed container formats
(RIFF/WAV PCM-16 audio, PPM P6 images) run end-to-end inside the Arrow
featurizer.  Compressed codecs (JPEG/MP3/H.264) would slot into
:func:`decode_media`'s dispatch when their libraries are available; the
WAV/PPM paths exercise the identical plumbing (binary column in, decoded
ndarray, vectorized features out).

The demo queries derive binary payloads from ``documents.text`` (UTF-8
bytes / synthesized PCM), so the computations are engine-portable and
oracle-checkable.
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


# ---------------------------------------------------------------------------
# real decoders (pure numpy; uncompressed container formats)
# ---------------------------------------------------------------------------

def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Minimal RIFF/WAVE PCM-16 mono encoder (44-byte canonical header)."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    n = len(pcm)
    import struct

    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + n, b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", n)
    return hdr + pcm


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE PCM-16 into (samples int16 (n,) or (n, ch), rate).
    Walks the chunk list properly (handles extra chunks before data)."""
    import struct

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid, size = struct.unpack_from("<4sI", b, pos)
        body = b[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0)
            if fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV: fmt={fmt} bits={bits}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    if channels and channels > 1:
        samples = samples.reshape(-1, channels)
    return samples, rate


def encode_ppm(img: np.ndarray) -> bytes:
    """Minimal binary PPM (P6) encoder for (H, W, 3) uint8 images."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_ppm(b: bytes) -> np.ndarray:
    """Decode binary PPM (P6) into an (H, W, 3) uint8 array (handles
    comment lines and arbitrary whitespace in the header)."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(b) and b[pos:pos + 1].isspace():
            pos += 1
        if b[pos:pos + 1] == b"#":                 # comment to EOL
            while pos < len(b) and b[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    pos += 1                                       # single ws after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return np.frombuffer(b, dtype=np.uint8,
                         count=w * h * 3, offset=pos).reshape(h, w, 3)


def decode_media(media_bytes: bytes, mime: str) -> np.ndarray:
    """Dispatch decode by mime.  Uncompressed formats decode in-process
    (pure numpy); compressed codecs raise until their libraries are
    wired in — the calling plumbing (binary column -> Arrow batch ->
    ndarray -> features) is identical either way."""
    if mime in ("audio/wav", "audio/x-wav"):
        return decode_wav(media_bytes)[0]
    if mime in ("image/x-portable-pixmap", "image/ppm"):
        return decode_ppm(media_bytes)
    raise NotImplementedError(
        f"media decode for {mime!r} requires a codec library "
        "(PIL.Image.open / librosa.load / av.open)")


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
    shape a decode UDF would use (Arrow binary arrays in, doubles out).
    Projects to the two columns the featurizer reads before crossing the
    Arrow boundary (the metadata struct would otherwise be serialized
    per row only to be ignored)."""
    import pandas as pd

    media_df = media_df.select("doc_id", "media")

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


#: deterministic text -> PCM sample derivation (shared with the oracle):
#: sample_i = ((byte_i * 2654435761) % 65536) - 32768
def _text_to_samples(text: str) -> np.ndarray:
    codes = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    return (((codes.astype(np.int64) * 2654435761) % 65536)
            - 32768).astype(np.int16)


def q_multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end audio decode pipeline: synthesize a REAL RIFF/WAV
    PCM-16 payload per doc (samples derived deterministically from the
    text bytes), then decode it back with the pure-numpy WAV decoder
    inside the Arrow featurizer and compute audio features (sample
    count, RMS, zero crossings, peak).  The DuckDB twin computes the
    same features from the text bytes directly — a container-format
    encode/decode bug on the Spark side would break the hash match.
    RMS is bit-exact across engines: the sum of squared int16 samples is
    exact integer arithmetic in float64, followed by one division and
    one sqrt."""
    import pandas as pd

    docs = _docs(spark, sf_dir)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, n_s, rms, zc, peak = [], [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                wav = encode_wav_pcm16(_text_to_samples(text))
                s, rate = decode_wav(wav)          # the real decode path
                assert rate == 16000
                f = s.astype(np.float64)
                ids.append(doc_id)
                n_s.append(len(s))
                rms.append(float(np.sqrt(np.dot(f, f) / len(f)))
                           if len(f) else 0.0)
                nonneg = s >= 0
                zc.append(int((nonneg[1:] != nonneg[:-1]).sum()))
                peak.append(int(np.abs(f).max()) if len(f) else 0)
            yield pd.DataFrame({"doc_id": ids, "n_samples": n_s,
                                "rms": rms, "zero_crossings": zc,
                                "peak": peak})

    feats = docs.select("doc_id", "text").mapInPandas(
        run, schema="doc_id bigint, n_samples bigint, rms double, "
                    "zero_crossings bigint, peak bigint")
    return (feats.select("doc_id", "n_samples",
                         _r6(F.col("rms")).alias("rms"),
                         "zero_crossings", "peak")
            .orderBy("doc_id"))


ORACLE_MULTIMODAL_AUDIO_STATS = """
WITH chars AS (
  SELECT doc_id,
         unnest(range(length(text))) AS i,
         unnest(string_split(text, '')) AS ch
  FROM documents
), s AS (
  SELECT doc_id, i,
         ((unicode(ch)::BIGINT * 2654435761) % 65536) - 32768 AS smp
  FROM chars
), lagged AS (
  SELECT doc_id, smp,
         LAG(smp) OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM s
)
SELECT doc_id,
       COUNT(*) AS n_samples,
       FLOOR(sqrt(SUM(smp * smp)::DOUBLE / COUNT(*)) * 1000000 + 0.5)
         / 1000000 AS rms,
       CAST(SUM(CASE WHEN prev IS NOT NULL
                      AND (smp >= 0) != (prev >= 0)
                THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
       MAX(ABS(smp)) AS peak
FROM lagged
GROUP BY doc_id
ORDER BY doc_id
"""


QUERIES = {
    "multimodal_byte_stats": q_multimodal_byte_stats,
    "multimodal_audio_stats": q_multimodal_audio_stats,
}

ORACLES = {
    "multimodal_byte_stats": ORACLE_MULTIMODAL_BYTE_STATS,
    "multimodal_audio_stats": ORACLE_MULTIMODAL_AUDIO_STATS,
}
