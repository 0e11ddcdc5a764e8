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
