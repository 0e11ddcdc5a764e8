"""End-to-end corpus-preparation pipeline bench — the composed
production path (`engine/corpus_job.prepare_corpus`: quality/dup gates
-> near-dup canonicalization -> chunk dedup -> PII scrub ->
deterministic shuffle -> packing offsets -> sharded write) timed as ONE
job at sf0.1 and at the 10x sf1 documents corpus (tools/make_sf1.py).

Individual operators are benched in tools/bench_operators.py; this
answers the question a pipeline owner actually asks — "what does a full
corpus build cost, and where does the time go?" — using the job's own
per-stage manifest lineage as the breakdown (no separate stopwatch
instrumentation that could drift from production).

Writes BENCH/pipeline.json.  Output dirs are created under a temp dir
and removed afterwards.  Usage:
    python tools/bench_pipeline.py            # sf0.1 + sf1 if present
    python tools/bench_pipeline.py --no-sf1   # sf0.1 only
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.path.join(REPO, ".testdata_sf1")


def _run(spark, docs_path: str, tag: str, work: str,
         dsir_frac: "float | None" = None,
         decontaminate: bool = False) -> dict:
    from pyspark.sql import functions as F

    from atr_adaptive_laguerre_spark.engine.corpus_job import prepare_corpus

    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()
    n_tok = docs.select(F.sum(F.size(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+")))).collect()[0][0]
    out = os.path.join(work, f"corpus_{tag}")
    man = os.path.join(work, f"manifest_{tag}")
    t0 = time.perf_counter()
    summary = prepare_corpus(spark, docs, out, manifest_dir=man,
                             run_id=f"bench-{tag}", chunk_dedup=True,
                             decontaminate=decontaminate,
                             dsir_frac=dsir_frac)
    wall = time.perf_counter() - t0
    stages = [
        {"stage": r["stage"], "n_in": r["n_docs_in"], "n_out": r["n_docs_out"],
         "wall_s": round(r["wall_sec"], 3)}
        for r in (spark.read.parquet(f"{man}/stages")
                  .orderBy("committed_at").collect())
    ]
    return {"tag": tag, "n_docs_in": n_docs, "n_tokens_in": int(n_tok),
            "n_docs_out": summary["n_docs_out"],
            "wall_s": round(wall, 3),
            "docs_per_sec": round(n_docs / wall, 1),
            "tokens_per_sec": round(n_tok / wall, 1),
            "stages": stages}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-sf1", action="store_true")
    args = ap.parse_args()

    from atr_adaptive_laguerre_spark.engine.session import build_session

    spark = build_session(app="pipeline-bench", master="local[32]",
                          shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="pipebench_")
    try:
        runs = [_run(spark, f"{SF01}/documents.parquet", "sf0.1", work),
                _run(spark, f"{SF01}/documents.parquet", "sf0.1_dsir",
                     work, dsir_frac=0.5),
                _run(spark, f"{SF01}/documents.parquet", "sf0.1_full",
                     work, dsir_frac=0.5, decontaminate=True)]
        sf1_docs = f"{SF1}/documents.parquet"
        if not args.no_sf1 and os.path.exists(sf1_docs):
            runs.append(_run(spark, sf1_docs, "sf1_10x", work))
        out = {"runs": runs}
        by_tag = {r["tag"]: r for r in runs}
        if "sf1_10x" in by_tag:
            out["wall_ratio_at_10x"] = round(
                by_tag["sf1_10x"]["wall_s"] / by_tag["sf0.1"]["wall_s"], 2)
        path = os.path.join(REPO, "BENCH", "pipeline.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out, indent=1))
        print("wrote", path)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
