"""Shared table loader for the operator library.

Small-file parallelism guard: the sf-scale test tables are single
parquet files, so the scan yields ONE input partition and every
downstream narrow stage (shingle explode, hash aggregation, Arrow
featurizers) serializes onto one core of a local[32] session —
measured 10.6 s -> 0.78 s on the sf0.1 shingle explode alone.  When
the scan's parallelism is below the cluster's default, repartition to
``defaultParallelism`` (a megabyte-scale round-robin shuffle on these
tables).  At 100 TB the same scan has thousands of ~128 MB splits, the
condition is false, and NO extra exchange enters the plan — the guard
is a no-op exactly where a forced repartition would have been a real
cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def read_jsonl(spark: SparkSession, path: str, schema,
               corrupt_col: str = "_corrupt_record") -> DataFrame:
    """JSON-lines source with a REQUIRED schema.

    Two deliberate production choices:

    * **No schema inference.**  Inference is a full extra pass over the
      input — at 100 TB that doubles the scan before any work starts,
      and a drifting upstream producer silently changes the inferred
      types between runs.  The caller states the contract; the reader
      enforces it.
    * **PERMISSIVE + corrupt-record routing.**  Web-scale JSONL always
      contains malformed lines; FAILFAST would kill a 1000-executor
      job hours in over one bad record.  Malformed lines land whole in
      ``corrupt_col`` (the parsed columns null) so the pipeline can
      count / quarantine them with a filter instead of dying —
      ``df.filter(col(corrupt_col).isNotNull())`` is the dead-letter
      stream, and the same expression's complement gates clean rows.

    Spark caveat: a query that references ONLY ``corrupt_col`` on the
    raw scan raises ``QUERY_ONLY_CORRUPT_RECORD_COLUMN`` — ``cache()``
    the returned frame (or project data columns alongside) before
    counting the dead-letter stream alone.
    """
    from pyspark.sql.types import StringType, StructType

    full = StructType(list(schema.fields))
    if corrupt_col not in full.fieldNames():
        full = full.add(corrupt_col, StringType())
    return (spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", corrupt_col)
            .json(path))


def read_jsonl_stream(spark: SparkSession, path: str, schema,
                      corrupt_col: str = "_corrupt_record") -> DataFrame:
    """Streaming twin of :func:`read_jsonl`: the same REQUIRED-schema +
    PERMISSIVE dead-letter contract over Structured Streaming's file
    source (new files under ``path`` become micro-batches).  The
    continuous-ingest shape: a 100 TB corpus doesn't arrive at once —
    crawl shards land as JSONL files and each micro-batch flows through
    the same gates (dedup index, DSIR model, quality filters) via
    ``foreachBatch``, with ``trigger(availableNow=True)`` draining the
    backlog for batch-parity runs."""
    from pyspark.sql.types import StringType, StructType

    full = StructType(list(schema.fields))
    if corrupt_col not in full.fieldNames():
        full = full.add(corrupt_col, StringType())
    return (spark.readStream.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", corrupt_col)
            .json(path))


def write_jsonl(df: DataFrame, path: str,
                compression: str = "gzip") -> None:
    """JSON-lines sink (one JSON object per line, splittable-at-scale
    layout: one file per partition, compressed per file — the standard
    interchange format for raw text corpora)."""
    df.write.mode("overwrite").option("compression", compression) \
        .json(path)
