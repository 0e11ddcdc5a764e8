"""Round-6 optimization measurement harness (bench.py stays FROZEN).

Per spark_optimization_guide.md §1: isolate each query with the noop
sink, label jobs, record min-of-N + spread, and dump
``.explain("formatted")`` for every measured query so plan claims in
OPTIMIZATION_r06.md are checkable against committed artifacts.

Usage:
    python bench_extra.py [--sf-dir DIR] [--runs N] [--tag before]
        [--queries a,b,c] [--no-plans] [--out FILE]

Writes plans to plans/r06/<query>_<tag>.txt and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))

KERNEL_QUERIES = ["core_rsi_kernel", "features_121_kernel"]
CATALOG_QUERIES = [
    "pricing_summary", "star_join_revenue", "events_lag_lead",
    "events_rolling_stats", "true_range_atr", "events_sessionize",
    "asof_join_orders", "resample_ohlcv_1h", "events_ffill_bfill",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--tag", default=None,
                    help="plan dump suffix (e.g. before/after); "
                         "no plans dumped when omitted")
    ap.add_argument("--queries", default=None,
                    help="comma list; default = kernel + 9 catalog")
    ap.add_argument("--out", default=None)
    ap.add_argument("--warm", action="store_true",
                    help="run the bench.py-style kernel warm-up first")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import bench as bench_mod
    from atr_adaptive_laguerre_spark.config import FeatureConfig
    from atr_adaptive_laguerre_spark.engine.features_job import (
        core_features_long, features_long,
    )
    from atr_adaptive_laguerre_spark.engine.session import build_session
    from atr_adaptive_laguerre_spark.queries import QUERIES

    sf_dir = args.sf_dir
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = bench_mod._sf_of(sf_dir)
    n_docs = max(200, int(bench_mod.DOCS_PER_SF * sf))
    names = (args.queries.split(",") if args.queries
             else KERNEL_QUERIES + CATALOG_QUERIES)

    spark = build_session(app="bench_extra", master=f"local[{cpus}]",
                          shuffle_partitions=max(2 * cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    cfg = FeatureConfig(atr_period=14)
    cfg121 = FeatureConfig.multi_interval(multiplier_1=3, multiplier_2=12,
                                          atr_period=14)
    need_kernel = any(q in names for q in KERNEL_QUERIES)
    doc_df = None
    if need_kernel:
        corpus = bench_mod._corpus_path(n_docs)
        doc_df = spark.read.parquet(corpus)
        if args.warm:
            warm = doc_df.repartition(cpus)
            features_long(warm, cfg121).count()
            core_features_long(warm, cfg).count()

    def kernel_df(name):
        if name == "core_rsi_kernel":
            return core_features_long(doc_df, cfg, num_partitions=cpus)
        return features_long(doc_df, cfg121, num_partitions=cpus)

    def make_runner(name):
        """(df_for_plan, run_fn) replicating bench.py's consumption."""
        if name in KERNEL_QUERIES:
            def run():
                df = kernel_df(name)
                col = ("rsi" if name == "core_rsi_kernel"
                       else "rsi_percentile_20_base")
                df.agg(F.count(F.lit(1)).alias("rows"),
                       F.sum(col).alias("chk")).collect()
            return kernel_df(name), run
        fn = QUERIES[name]

        def run():
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return fn(spark, sf_dir), run

    plans_dir = os.path.join(REPO, "plans", "r06")
    timings, spreads, samples = {}, {}, {}
    for name in names:
        df, run = make_runner(name)
        if args.tag:
            from atr_adaptive_laguerre_spark.queries import BENCH_QUERY_BODIES

            os.makedirs(plans_dir, exist_ok=True)

            def fmt(d):
                return d._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted"))

            text = fmt(df)
            if name in BENCH_QUERY_BODIES:
                # the public query truncates its plan at localCheckpoint;
                # dump the pre-ORDER-BY body too so the physical shape
                # (exchanges, window, aggregate strategy) stays checkable
                text += ("\n\n== Pre-ORDER-BY body (before localCheckpoint"
                         " truncation) ==\n")
                text += fmt(BENCH_QUERY_BODIES[name](spark, sf_dir))
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"),
                      "w") as fh:
                fh.write(text)
        times = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            run()
            times.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(min(times), 3)
        spreads[name] = round(max(times) - min(times), 3)
        samples[name] = [round(x, 3) for x in times]
        print(f"# {name}: min={timings[name]} spread={spreads[name]} "
              f"{samples[name]}", file=sys.stderr)

    out = {"metric": "bench_extra per-query isolation",
           "value": round(sum(timings.values()), 3), "unit": "sec",
           "queries": timings, "queries_spread": spreads,
           "queries_samples": samples, "runs_per_query": args.runs,
           "sf": sf, "sf_dir": sf_dir}
    spark.stop()
    line = json.dumps(out)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
