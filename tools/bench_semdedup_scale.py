"""SemDeDup / k-NN-graph scale evidence — the k-scaling law, measured.

Both operators cost N*k (codebook train+assign) + N^2/k (within-cell
pairs).  Fixing k while the corpus grows 10x blows the pair term up
100x — measured: at the 10x sf1 embeddings corpus the catalog's k=10
configuration did not finish inside a 10-minute bench budget.  Scaling
k with sqrt(N) balances the two terms at O(N^1.5): this script times
both operators at sf0.1 (N=2,000, k=10 — the catalog/oracle
configuration) and at the 10x dup-saturated sf1 corpus (N=20,000,
k=32 ~ 10*sqrt(10)), min-of-RUNS noop-sink walls after one warm-up,
and writes BENCH/semdedup_scale.json.

Usage: python tools/bench_semdedup_scale.py  (sf1 dir from
tools/make_sf1.py; quiet host recommended — see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.path.join(REPO, ".testdata_sf1")
RUNS = 2


def main() -> None:
    from atr_adaptive_laguerre_spark.engine.session import build_session
    from atr_adaptive_laguerre_spark.operators.similarity import (
        q_dedup_semantic, q_knn_graph,
    )

    spark = build_session(app="semdedup-scale", master="local[32]",
                          shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    configs = [("sf0.1", SF01, 10), ("sf1_10x", SF1, 32)]
    ops = [("dedup_semantic", q_dedup_semantic), ("knn_graph", q_knn_graph)]
    out: dict[str, dict] = {}
    for tag, sf_dir, k in configs:
        n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        for name, fn in ops:
            rows = fn(spark, sf_dir, k=k).count()      # warm-up + cardinality
            times = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                fn(spark, sf_dir, k=k).write.format("noop") \
                    .mode("overwrite").save()
                times.append(time.perf_counter() - t0)
            out[f"{name}@{tag}"] = {
                "n_vecs": n, "k": k, "wall_s": round(min(times), 3),
                "spread_s": round(max(times) - min(times), 3),
                "rows_out": rows, "runs": RUNS,
            }
            print(f"{name}@{tag}: n={n} k={k} "
                  f"min={min(times):.2f}s rows={rows}", flush=True)
    path = os.path.join(REPO, "BENCH", "semdedup_scale.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
