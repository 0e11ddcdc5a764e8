"""Input-source resolution for the sequence table.

The production target is an Iceberg table of pre-tokenized training
sequences (north star: ``(doc_id string, tokens array<int32>, n_tok
int32, source string)`` at 10^12 rows); this sandbox has no Iceberg
runtime, so every entry point takes EITHER a catalog table reference or
a parquet path and resolves through one function:

* ``db.table`` / ``catalog.db.table`` (no path separator, no suffix)
  -> ``spark.read.table`` — the Iceberg/managed-table path.  Catalyst
  gets partition pruning, hidden-partitioning transforms, and
  min/max-stat file skipping from the table format's metadata; no code
  here changes between formats.
* anything path-like -> parquet scan (the sandbox/test path; same
  schema, same pruning via parquet footers).

Iceberg time travel maps to reader options on the SAME call
(``snapshot-id`` / ``as-of-timestamp``) — accepted here and applied
only on the table branch, so checkpoint-resume jobs can pin the exact
snapshot a run started from (manifest lineage records it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def is_table_ref(ref: str) -> bool:
    """Syntactically a catalog table reference (not path-like): no
    separator, no ``.parquet`` suffix, no URI scheme.  Ambiguous bare
    names ('events') are resolved by :func:`read_sequences` — catalog
    registration wins, local filesystem is the fallback — so the answer
    never depends on the driver's working directory when the catalog
    actually knows the name."""
    import re

    if "/" in ref or "\\" in ref or ref.endswith(".parquet"):
        return False
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", ref):   # URI scheme
        return False
    return True


def read_sequences(spark: SparkSession, ref: str,
                   snapshot_id: int | None = None,
                   as_of_timestamp_ms: int | None = None) -> DataFrame:
    """Resolve the sequence table from a catalog reference or a parquet
    path.  Snapshot pins apply only to table refs (Iceberg reader
    options); passing one with a path is an error, not a silent no-op.

    Ambiguity rule for bare names: a name the CATALOG knows is always a
    table (a stray ./events directory in the driver's CWD cannot hijack
    a registered table); a syntactic table ref the catalog does NOT
    know falls back to a local filesystem path if one exists (ADVICE
    r2: bare relative directories would otherwise fail with a
    confusing table-not-found)."""
    import os

    def _known_table(name: str) -> bool:
        # a bare name that is not even a valid SQL identifier (e.g.
        # 'corpus-v2') makes tableExists raise ParseException — that
        # means "not a table", not an error
        try:
            return spark.catalog.tableExists(name)
        except Exception:
            return False

    if is_table_ref(ref) and (_known_table(ref)
                              or not os.path.exists(ref)):
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", snapshot_id)
        if as_of_timestamp_ms is not None:
            reader = reader.option("as-of-timestamp", as_of_timestamp_ms)
        return reader.table(ref)
    if snapshot_id is not None or as_of_timestamp_ms is not None:
        raise ValueError(
            "snapshot pinning requires a catalog table reference; "
            f"got a path: {ref!r}")
    return spark.read.parquet(ref)
