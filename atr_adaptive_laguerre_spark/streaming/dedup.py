"""Streaming exact deduplication — the streaming twin of the batch
``dedup_exact`` operator (operators/dedup.py).

``dropDuplicatesWithinWatermark`` on the normalized-content md5 keeps the
FIRST arrival of each content group and suppresses any duplicate that
arrives within the watermark horizon; state for a hash is evicted once
the event-time watermark passes it, so state size is bounded by the
duplicate-arrival window instead of the corpus size — the property that
makes streaming dedup feasible at 10^12-sequence scale (an unbounded
``dropDuplicates`` would accrete one state row per distinct document
forever).

Determinism note: "first arrival" is micro-batch order, not min(doc_id)
— canonical-id selection is a batch concern (the batch operator picks
min(doc_id)); the streaming operator's contract is exactly-one survivor
per content group per watermark window, which the test asserts.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

#: documents arriving on a stream carry an event-time column
DOC_TS_SCHEMA = "doc_id string, text string, ts timestamp"


def stream_dedup_exact(spark: SparkSession, input_dir: str, output_dir: str,
                       checkpoint_dir: str,
                       watermark: str = "10 minutes") -> None:
    """File-source stream -> normalized-content md5 ->
    dropDuplicatesWithinWatermark -> parquet sink (append).

    Plan shape at scale: one shuffle on the content hash per micro-batch
    plus the watermark-bounded state store — identical key distribution
    to the batch operator's single exchange.
    """
    sdf = spark.readStream.schema(DOC_TS_SCHEMA).parquet(input_dir)
    norm = F.concat_ws(
        " ", F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    hashed = sdf.select("doc_id", "ts", F.md5(norm).alias("chash"))
    dedup = (hashed.withWatermark("ts", watermark)
             .dropDuplicatesWithinWatermark(["chash"]))
    q = (dedup.writeStream.format("parquet")
         .outputMode("append")
         .option("path", output_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
