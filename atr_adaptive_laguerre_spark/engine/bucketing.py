"""Bucketed-table layout for shuffle-free co-located joins.

At 100 TB the biggest recurring cost of the relational layer is the
shuffle on every big-big equi-join and aggregation.  Bucketing removes
it for STABLE keys: write the table once with ``bucketBy(n, key)`` (+
``sortBy`` for sort-merge readiness) and every subsequent join or
groupBy on that key reads co-located buckets with NO exchange — the
scan itself satisfies the required hash distribution
(``spark.sql.sources.bucketing.enabled``, on by default).

Where this engine uses it: the token corpus and its derived feature
tables share the entity key ``(source, doc_id)``.  A pipeline that
repeatedly joins features to labels, availability calendars, or
curation verdicts on the entity key amortizes ONE bucketed write into
zero-shuffle joins forever after — the same trade the manifest's
stable ``xxhash64(source, doc_id) mod n_buckets`` sharding makes for
resume, applied to the storage layout.

Sizing rule: pick ``n_buckets`` so one bucket of the LARGER table is
~128-256 MB (a single task's comfortable working set); both sides of a
co-located join must use the SAME bucket count and key.

This is a metastore feature: bucketed tables go through
``saveAsTable`` (Hive-style layout in the session warehouse), not bare
``.parquet(path)`` writes — path-written files carry no bucket
metadata and Spark will not trust their distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: list[str],
                   n_buckets: int, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as a bucketed (and optionally sorted) managed table.

    ``sort_cols`` defaults to ``keys`` — pre-sorting within buckets lets
    a later sort-merge join skip its sort as well as its shuffle."""
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    w = w.sortBy(*(sort_cols or keys))
    w.format("parquet").saveAsTable(table)


def cobucketed_join(spark: SparkSession, left_table: str,
                    right_table: str, on: list[str],
                    how: str = "inner") -> DataFrame:
    """Join two tables previously written with :func:`write_bucketed`
    on the same keys and bucket count.  The plan this produces contains
    NO Exchange on either side (asserted in
    ``tests/test_bucketing.py``) — the bucketed scans already satisfy
    the join's distribution requirement."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
