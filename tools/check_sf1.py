"""sf1 correctness spot-gate (VERDICT r3 item 8) — two-stage design.

A direct DuckDB oracle run at sf1 is infeasible: the recursive-CTE
kernel oracles exceeded 85 GB of in-memory recursion state on the
50,000-doc corpus and were aborted (the CTEs carry the full per-step
kernel state, including the rolling TR list, for every (doc, i) row).
So the gate verifies sf1 values without pretending the oracle ran:

1. **Anchor** — Spark vs DuckDB full value-hash at sf0.1 via
   ``tools/check_correctness.py /root/testdata/sf0.1 <flagships>`` (the
   largest scale the oracles handle affordably).  This pins the VALUES
   of every flagship query.
2. **Scale** — the sf1 corpus (``tools/make_sf1.py``) is 10 disjoint
   doc_id-shifted copies of sf0.1, and every flagship kernel query is
   PER-ENTITY: its output for a document depends only on that
   document.  Therefore the sf1 Spark output must equal the sf0.1
   output replicated per copy — any effect of corpus size on
   per-entity results (batch-shape-dependent float paths, overflow,
   partition-boundary bugs, ANSI errors appearing only at scale)
   breaks the equality.  The comparison runs DISTRIBUTED: each row
   hashes (doc_id mod SHIFT, every output column) with xxhash64 (IEEE
   bit patterns for doubles), rows xor-fold per copy (the same
   order-independent fingerprint the manifest uses), and all ten
   per-copy (count, fingerprint) pairs must equal the sf0.1 pair.
   Nothing is materialized on the driver — a first attempt that
   compared via toPandas died collecting the 2.7M x 125 frame.

``feature_ic_sweep`` is a corpus-GLOBAL aggregate (rank pooling across
docs), so the replication invariant does not apply; at sf1 it is run
Spark-side for shape/error only and its values stay anchored at sf0.1.

Usage: python tools/check_sf1.py            # prints per-query PASS/FAIL
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".testdata_sf1")
COPIES = 10
SHIFT = 10_000_000

#: per-entity flagship queries: replication-verifiable at sf1
PER_ENTITY = [
    "core_rsi_features",
    "features_43_single_interval",
    "features_121_multi_interval",
    "features_121_availability",
    "rangebar_enrich",
]
#: corpus-global aggregate: Spark-side shape/error check only at sf1
GLOBAL_ONLY = ["feature_ic_sweep"]


def copy_fingerprints(df):
    """(copy, n_rows, fingerprint) — xor-fold of per-row xxhash64 over
    (doc_id mod SHIFT, all other columns, sorted by name)."""
    from pyspark.sql import functions as F

    id_int = F.col("doc_id").cast("bigint")
    others = [F.col(c) for c in sorted(df.columns) if c != "doc_id"]
    row_h = F.xxhash64(F.pmod(id_int, F.lit(SHIFT)), *others)
    return (df.select(F.floor(id_int / F.lit(SHIFT)).cast("int")
                      .alias("copy"), row_h.alias("rh"))
            .groupBy("copy")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.expr("bit_xor(rh)").alias("fp")))


def main() -> int:
    from atr_adaptive_laguerre_spark.engine.session import build_session
    from atr_adaptive_laguerre_spark.queries import QUERIES

    if not os.path.exists(os.path.join(SF1, "documents.parquet")):
        print("run tools/make_sf1.py first", file=sys.stderr)
        return 2

    spark = build_session(app="check-sf1", master="local[16]",
                          shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0

    for name in PER_ENTITY:
        t0 = time.time()
        fn = QUERIES[name]
        base = copy_fingerprints(fn(spark, SF01)).collect()
        ok = len(base) == 1 and base[0]["copy"] == 0
        if ok:
            want_n, want_fp = base[0]["n"], base[0]["fp"]
            got = {r["copy"]: (r["n"], r["fp"])
                   for r in copy_fingerprints(fn(spark, SF1)).collect()}
            ok = (len(got) == COPIES
                  and all(got.get(k) == (want_n, want_fp)
                          for k in range(COPIES)))
        failures += 0 if ok else 1
        n = base[0]["n"] if base else 0
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {COPIES} sf1 copies "
              f"x {n} rows, per-copy (count, xor-fingerprint) == sf0.1 "
              f"[{time.time() - t0:.1f}s]", flush=True)

    for name in GLOBAL_ONLY:
        t0 = time.time()
        try:
            rows = QUERIES[name](spark, SF1).collect()
            ok = len(rows) > 0
            print(f"{'PASS' if ok else 'FAIL'}  {name}: sf1 Spark-side "
                  f"rows {len(rows)} (global aggregate — values anchored "
                  f"at sf0.1) [{time.time() - t0:.1f}s]", flush=True)
            failures += 0 if ok else 1
        except Exception as e:           # noqa: BLE001 — the gate reports
            print(f"FAIL  {name}: {e}", flush=True)
            failures += 1

    spark.stop()
    print(f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
