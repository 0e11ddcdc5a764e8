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


#: Allocator tuning for the driver JVM and the Python workers (both
#: inherit this environment in local mode; ``spark.executorEnv.*``
#: propagates it to cluster executors).  Page-fault handling collapses
#: under many-core concurrency on virtualized hosts, so freed buffers
#: must STAY MAPPED — the per-process analogue of the kernel-side
#: Workspace/OutPool discipline:
#:
#: * ``MALLOC_TRIM_THRESHOLD_=-1`` — never give the main-arena heap
#:   back to the OS.
#: * ``MALLOC_MMAP_THRESHOLD_=32 MiB`` (glibc's hard cap) — blocks up
#:   to 32 MiB come from the retained heap instead of per-block
#:   mmap/munmap.  16 MiB (the r2 value) exactly matched the Arrow/
#:   netty allocator's chunk size, so every JVM-side Arrow chunk was
#:   still mmap'd and the receive path re-faulted the full funnel
#:   volume (~1.2 M faults/run measured at sf0.1) every query run.
#: * ``MALLOC_ARENA_MAX=1`` — glibc frees EMPTY NON-MAIN arena heaps
#:   back to the OS regardless of the trim threshold, so the JVM's
#:   multi-threaded allocations must be pinned to the main arena for
#:   the retention settings to hold.  Measured: java faults/run
#:   1.2 M -> ~0.3 M, python workers 0.43 M -> 0.25 M, with no
#:   arena-lock contention visible in the relational suite.
#: * ``ARROW_DEFAULT_MEMORY_POOL=system`` — pyarrow's bundled jemalloc
#:   purges dirty pages after a decay interval (madvise DONTNEED), so
#:   worker-side Arrow buffers re-faulted on every run; the system
#:   (glibc) pool inherits the retention settings above.
MALLOC_ENV = {
    "MALLOC_TRIM_THRESHOLD_": "-1",
    "MALLOC_MMAP_THRESHOLD_": "33554432",
    "MALLOC_ARENA_MAX": "1",
    "ARROW_DEFAULT_MEMORY_POOL": "system",
}


def _bigcache_preload() -> str | None:
    """Path to the ``native/bigcache.so`` retaining-allocator shim,
    compiling it on first use when a C toolchain is present.

    glibc cannot retain EVERY large block (the mmap threshold is capped
    at 32 MiB and one-arena mode fragments under 32 interleaved JVM
    threads, measured as ~1.5 GB of brk growth per features_121 run),
    so the shim serves allocations >= 512 KiB from one MAP_NORESERVE
    reservation with power-of-two freelists that are never munmapped.
    Measured at sf0.1 (OPTIMIZATION_r06.md): steady-state driver-JVM
    faults 1.2 M -> ~15 k per run, worker median 7.  Returns None (and
    the engine runs unchanged) when the library is unavailable;
    BIGCACHE_DISABLE=1 turns the loaded shim into a no-op.
    """
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    so = os.path.join(root, "native", "bigcache.so")
    src = os.path.join(root, "native", "bigcache.c")
    if not os.path.exists(so) and os.path.exists(src):
        import shutil
        import subprocess
        cc = shutil.which("gcc") or shutil.which("cc")
        if cc is None:
            return None
        try:
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", so, src,
                 "-lpthread", "-ldl"],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    return so if os.path.exists(so) else None


def build_session(app: str = "atr-adaptive-laguerre-spark",
                  master: str | None = None,
                  shuffle_partitions: int | None = None,
                  extra: dict[str, str] | None = None) -> SparkSession:
    # set before the JVM starts: local-mode Python workers inherit the
    # driver JVM's environment
    for k, v in MALLOC_ENV.items():
        os.environ.setdefault(k, v)
    so = _bigcache_preload()
    if so is not None and so not in os.environ.get("LD_PRELOAD", ""):
        prev = os.environ.get("LD_PRELOAD")
        os.environ["LD_PRELOAD"] = f"{so}:{prev}" if prev else so
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
