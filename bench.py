"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>, ...extras}

The flagship measure is the per-entity kernel over a deterministic
synthetic token corpus (input_hint shape) sized to the scale factor;
relational/window/as-of queries run on the driver's testdata tables.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")

# bench-corpus sizing: ~58k tokens per doc-count unit; sf0.1 -> 8k docs,
# ~4.6M tokens (comparable work to the sf0.1 relational tables)
DOCS_PER_SF = 80_000


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def _corpus_path(n_docs: int) -> str:
    import hashlib
    import inspect

    from atr_adaptive_laguerre_spark.data import corpus as corpus_mod

    os.makedirs(CACHE_DIR, exist_ok=True)
    # cache key includes the generator source hash: editing corpus.py
    # must invalidate cached corpora, or benchmarks silently measure
    # stale data while their internal asserts still pass
    gen_sig = hashlib.md5(
        inspect.getsource(corpus_mod).encode()).hexdigest()[:8]
    path = os.path.join(CACHE_DIR, f"tokens_{n_docs}_{gen_sig}.parquet")
    if not os.path.exists(path):
        corpus_mod.write_corpus_parquet(path, n_docs=n_docs, seed=42)
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)
    n_docs = max(200, int(DOCS_PER_SF * sf))

    from pyspark.sql import functions as F

    from atr_adaptive_laguerre_spark.config import FeatureConfig
    from atr_adaptive_laguerre_spark.engine.features_job import (
        core_features_long, features_long,
    )
    from atr_adaptive_laguerre_spark.engine.session import build_session
    from atr_adaptive_laguerre_spark.queries import QUERIES

    corpus = _corpus_path(n_docs)
    spark = build_session(app="bench", master=f"local[{cpus}]",
                          shuffle_partitions=max(2 * cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    extras: dict[str, float] = {}

    # ---- warm-up (excluded from timings, mirroring the reference's own
    # post-JIT-warmup perf gate, tests/test_features/test_performance.py:52-68):
    # grows Python-worker workspaces + JVM ingest buffers once ----
    doc_df = spark.read.parquet(corpus)
    n_seq = doc_df.count()
    n_tok_total = doc_df.agg(F.sum("n_tok")).collect()[0][0]
    cfg = FeatureConfig(atr_period=14)
    cfg121 = FeatureConfig.multi_interval(multiplier_1=3, multiplier_2=12,
                                          atr_period=14)
    warm = doc_df.repartition(cpus)
    features_long(warm, cfg121).count()
    core_features_long(warm, cfg).count()

    RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "4"))

    def timed_runs(fn, runs=RUNS):
        """All N wall times: this shared host varies 3-8x with neighbor
        load, so the artifact records BOTH the min (the least-noise
        estimate, and the round-over-round comparable number) and the
        max-min spread (so a reader can judge how noisy the run was
        without cross-referencing docs — VERDICT r3 item 4)."""
        times = []
        for _ in range(runs):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return times

    def record(name, fn, runs=RUNS):
        times = timed_runs(fn, runs)
        timings[name] = round(min(times), 3)
        spreads[name] = round(max(times) - min(times), 3)
        return timings[name]

    # ---- flagship: core kernel over the token corpus ----
    def run_core():
        # cpus partitions = one scheduling wave with the fullest Arrow
        # batches (the bench corpus is length-balanced; cpus*3 oversplit
        # is for skewed corpora / few local files)
        feats = core_features_long(doc_df, cfg, num_partitions=cpus)
        agg = feats.agg(F.count(F.lit(1)).alias("rows"),
                        F.sum("rsi").alias("rsi_sum")).collect()[0]
        assert agg["rows"] == n_tok_total, (agg["rows"], n_tok_total)

    record("core_rsi_kernel", run_core)
    extras["n_sequences"] = n_seq
    extras["n_tokens"] = int(n_tok_total)

    # ---- headline: full 121-column multi-interval feature matrix ----
    def run_121():
        f121 = features_long(doc_df, cfg121, num_partitions=cpus)
        agg = f121.agg(F.count(F.lit(1)).alias("rows"),
                       F.sum("rsi_percentile_20_base").alias("chk")
                       ).collect()[0]
        assert agg["rows"] == n_tok_total, (agg["rows"], n_tok_total)

    dt = record("features_121_kernel", run_121)
    extras["sequences_per_sec"] = round(n_seq / dt, 1)
    extras["tokens_per_sec"] = round(n_tok_total / dt, 1)
    extras["feature_values_per_sec"] = round(n_tok_total * 121 / dt, 1)

    # ---- catalog queries on the sf tables ----
    bench_queries = [
        "pricing_summary", "star_join_revenue", "events_lag_lead",
        "events_rolling_stats", "true_range_atr", "events_sessionize",
        "asof_join_orders", "resample_ohlcv_1h", "events_ffill_bfill",
    ]
    for name in bench_queries:
        fn = QUERIES[name]

        def run_query(fn=fn):
            # force full computation without driver materialization cost
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        record(name, run_query)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline suite wall time (kernel + operator queries)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_spread": spreads,
        "runs_per_query": RUNS,
        "sf": sf,
        **extras,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
