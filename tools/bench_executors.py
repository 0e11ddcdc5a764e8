"""Executor-style scaling benchmark: N vs 4N *separate executor
processes*, each a fixed-size local[C] Spark instance working its own
shard of the same corpus.

This mirrors the north rule's "N-executor vs 4N-executor cluster" more
faithfully than one growing local[*] JVM: every executor has its own
JVM, Python workers, Arrow sockets and ingest funnel (exactly what a
real cluster replicates per node), and only the host's physical
resources are shared — which is the quantity whose scaling is being
demonstrated.

Shards are assigned by the stable bucket key (engine.manifest.bucket_col)
so both cluster sizes process identical total work.  Efficiency =
throughput(4N execs) / (4 x throughput(N execs)).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXEC_CODE = r"""
import sys, time
sys.path.insert(0, {root!r})
from pyspark.sql import functions as F
from atr_adaptive_laguerre_spark.config import FeatureConfig
from atr_adaptive_laguerre_spark.engine.features_job import (
    features_checksum, features_long,
)
from atr_adaptive_laguerre_spark.engine.manifest import bucket_col
from atr_adaptive_laguerre_spark.engine.session import build_session

exec_id = {exec_id}
n_exec = {n_exec}
cores = {cores}
spark = build_session(app=f"exec{{exec_id}}", master=f"local[{{cores}}]",
                      shuffle_partitions=cores * 2,
                      extra={{"spark.driver.memory": "6g"}})
spark.sparkContext.setLogLevel("ERROR")
doc = (spark.read.parquet({corpus!r})
       .withColumn("b", bucket_col(n_exec))
       .filter(F.col("b") == exec_id).drop("b")
       .repartition(cores * 4).cache())
n_tok = doc.agg(F.sum("n_tok")).collect()[0][0]
cfg = FeatureConfig.multi_interval(multiplier_1=3, multiplier_2=12,
                                   atr_period=14)
sink = {sink!r}
import shutil, os
def run_once(tag):
    out = f"/tmp/exec_out_{{exec_id}}_{{tag}}"
    shutil.rmtree(out, ignore_errors=True)
    if sink == "parquet":
        (features_long(doc, cfg).write.mode("overwrite")
         .option("compression", "zstd").parquet(out))
        rows = n_tok
    elif sink == "checksum":
        rows = (features_checksum(doc, cfg)
                .agg(F.sum("n_rows")).collect()[0][0])
    else:
        rows = features_long(doc, cfg).count()
    shutil.rmtree(out, ignore_errors=True)
    return rows
run_once("warm")    # warm-up
print(f"READY {{exec_id}} {{n_tok}}", flush=True)
sys.stdin.readline()               # barrier: wait for GO
t0 = time.time()
rows = run_once("run")
dt = time.time() - t0
assert rows == n_tok
print(f"DONE {{exec_id}} {{dt:.3f}} {{int(n_tok)}}", flush=True)
spark.stop()
"""


def run_cluster(n_exec: int, cores: int, corpus: str) -> dict:
    procs = []
    for e in range(n_exec):
        code = EXEC_CODE.format(root=ROOT, exec_id=e, n_exec=n_exec,
                                cores=cores, corpus=corpus,
                                sink=os.environ.get("EXEC_SINK", "count"))
        p = subprocess.Popen([sys.executable, "-c", code],
                             stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                             stderr=subprocess.DEVNULL, text=True)
        procs.append(p)
    # barrier: wait until every executor is warmed, then release together
    toks = {}
    for p in procs:
        while True:
            line = p.stdout.readline()
            if line.startswith("READY"):
                _, eid, nt = line.split()
                toks[int(eid)] = int(nt)
                break
            if not line:
                raise RuntimeError("executor died before READY")
    t0 = time.time()
    for p in procs:
        p.stdin.write("GO\n")
        p.stdin.flush()
    per_exec = {}
    for p in procs:
        while True:
            line = p.stdout.readline()
            if line.startswith("DONE"):
                _, eid, dt, nt = line.split()
                per_exec[int(eid)] = float(dt)
                break
            if not line:
                raise RuntimeError("executor died before DONE")
    wall = time.time() - t0
    for p in procs:
        p.stdin.close()
        p.wait(timeout=120)
    n_tok = sum(toks.values())
    return {"n_exec": n_exec, "cores_per_exec": cores,
            "wall_sec": round(wall, 3),
            "per_exec_sec": per_exec, "n_tok": n_tok,
            "tok_per_sec": round(n_tok / wall, 1)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("EXEC_CORES", "4"))
    n = int(os.environ.get("EXEC_N", "2"))
    sys.path.insert(0, ROOT)
    from bench import _corpus_path, _sf_of, DOCS_PER_SF

    sf = _sf_of(sf_dir)
    n_docs = int(os.environ.get("SCALING_DOCS",
                                max(800, int(4 * DOCS_PER_SF * sf))))
    corpus = _corpus_path(n_docs)

    runs_low = [run_cluster(n, cores, corpus) for _ in range(2)]
    runs_high = [run_cluster(4 * n, cores, corpus) for _ in range(2)]
    low = max(runs_low, key=lambda r: r["tok_per_sec"])
    high = max(runs_high, key=lambda r: r["tok_per_sec"])
    eff = high["tok_per_sec"] / (4.0 * low["tok_per_sec"])
    result = {
        "metric": f"executor-style scaling: {n} vs {4 * n} executors "
                  f"x local[{cores}] each, 121-col feature job",
        "low": low, "high": high, "efficiency": round(eff, 4), "sf": sf,
    }
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(ROOT, "BENCH",
                           f"scaling_exec_{n}x{cores}.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
