"""ANN recall/latency tradeoff — the curve every real ANN system ships.

Ground truth is the exact brute-force top-5 cosine neighbors
(`ann_topk_cosine`, restricted to the IVF query set).  For each
``nprobe`` in NPROBES this times `ann_ivf_topk` (exact cosine inside
probed cells — recall loss comes only from cell misses),
`ann_ivfpq_topk` (PQ asymmetric-distance scoring — adds quantization
distortion on top), and `ann_ivfpq_rerank` (ADC shortlist + exact
rerank — the FAISS IndexRefine shape), and reports

    recall@5 = |approx top-5 ∩ exact top-5| / 5, averaged over queries

plus min-of-RUNS noop-sink wall.  At nprobe = KMEANS_K every cell is
probed, so IVF recall must be exactly 1.0 (a built-in sanity check —
the script asserts it) while IVF+PQ stays below 1.0 by its code-book
distortion: the gap isolates WHERE each variant loses recall.

Writes BENCH/ann_recall.json.  Usage:
    python tools/bench_ann_recall.py   (quiet host; sf0.1 by default)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NPROBES = (1, 2, 3, 5, 10)
RUNS = 2


def _topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.select("query_id", "cand_id").collect():
        out.setdefault(r["query_id"], set()).add(r["cand_id"])
    return out


def _recall(approx: dict[int, set[int]], exact: dict[int, set[int]]) -> float:
    per_q = [len(approx.get(q, set()) & cands) / len(cands)
             for q, cands in exact.items()]
    return sum(per_q) / len(per_q)


def main() -> None:
    from pyspark.sql import functions as F

    from atr_adaptive_laguerre_spark.engine.session import build_session
    from atr_adaptive_laguerre_spark.operators.similarity import (
        IVF_N_QUERIES, IVF_NPROBE, KMEANS_K, TOP_K,
        q_ann_ivf_topk, q_ann_ivfpq_rerank, q_ann_ivfpq_residual_topk,
        q_ann_ivfpq_topk, q_ann_topk_cosine,
    )

    spark = build_session(app="ann-recall", master="local[32]",
                          shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    exact = _topk_sets(q_ann_topk_cosine(spark, SF_DIR)
                       .filter(F.col("query_id") < IVF_N_QUERIES))
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()

    out: dict = {"sf_dir": SF_DIR, "n_vecs": n_vecs, "k_cells": KMEANS_K,
                 "top_k": TOP_K, "n_queries": IVF_N_QUERIES,
                 "catalog_nprobe": IVF_NPROBE, "runs": RUNS, "curve": []}
    for name, fn in (("ivf", q_ann_ivf_topk), ("ivfpq", q_ann_ivfpq_topk),
                     ("ivfpq_residual", q_ann_ivfpq_residual_topk),
                     ("ivfpq_rerank", q_ann_ivfpq_rerank)):
        for nprobe in NPROBES:
            rec = _recall(_topk_sets(fn(spark, SF_DIR, nprobe=nprobe)), exact)
            times = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                fn(spark, SF_DIR, nprobe=nprobe).write.format("noop") \
                    .mode("overwrite").save()
                times.append(time.perf_counter() - t0)
            row = {"variant": name, "nprobe": nprobe,
                   "recall_at_5": round(rec, 4),
                   "wall_s": round(min(times), 3),
                   "spread_s": round(max(times) - min(times), 3)}
            out["curve"].append(row)
            print(f"{name} nprobe={nprobe}: recall@5={rec:.3f} "
                  f"min={min(times):.2f}s", flush=True)
            if name == "ivf" and nprobe >= KMEANS_K and rec < 1.0:
                raise SystemExit("IVF at nprobe=k must be exact "
                                 f"(got recall {rec})")
    # shortlist-size sweep at nprobe=k (all cells probed): isolates the
    # PQ-shortlist quality term; at r_cand = N the rerank is exact by
    # construction, so recall must climb monotonically toward 1.0
    for r_cand in (25, 50, 100, 400):
        rec = _recall(_topk_sets(q_ann_ivfpq_rerank(
            spark, SF_DIR, nprobe=KMEANS_K, r_cand=r_cand)), exact)
        t0 = time.perf_counter()
        q_ann_ivfpq_rerank(spark, SF_DIR, nprobe=KMEANS_K,
                           r_cand=r_cand).write.format("noop") \
            .mode("overwrite").save()
        row = {"variant": "ivfpq_rerank", "nprobe": KMEANS_K,
               "r_cand": r_cand, "recall_at_5": round(rec, 4),
               "wall_s": round(time.perf_counter() - t0, 3)}
        out["curve"].append(row)
        print(f"ivfpq_rerank r={r_cand}: recall@5={rec:.3f}", flush=True)
    # sparse-JL two-stage ANN (q_ann_rp_topk): projection width ×
    # shortlist size — the dim-reduction analog of the PQ shortlist
    # sweep above.  Uses the FULL query set (RP has no cell structure,
    # so no reason to restrict to the IVF query subset).
    from atr_adaptive_laguerre_spark.operators.similarity import (
        q_ann_rp_topk,
    )

    exact_all = _topk_sets(q_ann_topk_cosine(spark, SF_DIR))
    for k in (16, 32):
        for r_cand in (50, 100, 200):
            rec = _recall(_topk_sets(q_ann_rp_topk(
                spark, SF_DIR, k=k, shortlist=r_cand)), exact_all)
            t0 = time.perf_counter()
            q_ann_rp_topk(spark, SF_DIR, k=k, shortlist=r_cand) \
                .write.format("noop").mode("overwrite").save()
            row = {"variant": "rp", "rp_k": k, "r_cand": r_cand,
                   "recall_at_5": round(rec, 4),
                   "wall_s": round(time.perf_counter() - t0, 3)}
            out["curve"].append(row)
            print(f"rp k={k} r={r_cand}: recall@5={rec:.3f}", flush=True)
    path = os.path.join(REPO, "BENCH", "ann_recall.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
