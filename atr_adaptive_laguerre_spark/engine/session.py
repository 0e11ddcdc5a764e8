"""SparkSession builder tuned for this engine.

Scale rationale (100 TB / 1000-executor target; tested on local[N]):

* AQE on — runtime coalescing of shuffle partitions and skew-join
  splitting cover the relational layer; the per-entity kernel layer
  handles its own skew (see ``engine.partitioning``).
* Arrow enabled with a bounded ``maxRecordsPerBatch`` — the kernel's
  memory is proportional to (docs per batch) x (max doc length); doc-grain
  rows are wide (the tokens array), so small record batches keep the
  Python worker's resident set flat.
* ``spark.sql.files.maxPartitionBytes`` left at default 128 MB: input
  bytes are proportional to total tokens, which is proportional to kernel
  work, so byte-based file splits are already work-balanced.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


#: glibc malloc tuning for the Python workers: never trim the heap back
#: to the OS and keep mid-size (<16 MB) blocks on the heap instead of
#: mmap'ing them — page-fault handling collapses under many-core
#: concurrency on virtualized hosts, so freed buffers must stay mapped.
MALLOC_ENV = {
    "MALLOC_TRIM_THRESHOLD_": "-1",
    "MALLOC_MMAP_THRESHOLD_": "16777216",
}


def build_session(app: str = "atr-adaptive-laguerre-spark",
                  master: str | None = None,
                  shuffle_partitions: int | None = None,
                  extra: dict[str, str] | None = None) -> SparkSession:
    # set before the JVM starts: local-mode Python workers inherit the
    # driver JVM's environment
    for k, v in MALLOC_ENV.items():
        os.environ.setdefault(k, v)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus * 2, 8)
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.execution.arrow.pyspark.selfDestruct.enabled",
                "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in MALLOC_ENV.items():
        b = b.config(f"spark.executorEnv.{k}", v)   # cluster mode
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    active = SparkSession.getActiveSession()
    if active is not None:
        cur = active.conf.get("spark.master", "")
        if cur != master:
            # getOrCreate() would silently hand back the old session and
            # ignore every config above (master, shuffle partitions,
            # memory) — mistuned benchmarks with no warning; rebuild
            active.stop()
    return b.getOrCreate()
