"""Skew stress bench (VERDICT r2 item 7): a pathological heavy-tailed
corpus — thousands of small docs plus a handful of multi-million-token
giants — through the checksum-sink feature job, comparing the
single-tier round-robin layout against the two-tier oversized layout
(``engine.partitioning.tiered_repartition``).

Reports, per layout:

* per-partition token mass (max / median) — the deterministic imbalance
  metric (a partition's kernel work is proportional to its token mass);
* measured wall of the 121-column checksum job (min of N post-warm-up).

Writes BENCH/skew.json and prints a summary table.  Run on a quiet host
(wall noise 3-8x with neighbor load); the token-mass table is
load-independent.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from atr_adaptive_laguerre_spark.config import FeatureConfig
from atr_adaptive_laguerre_spark.engine.features_job import features_checksum
from atr_adaptive_laguerre_spark.engine.partitioning import tiered_repartition
from atr_adaptive_laguerre_spark.engine.session import build_session

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_SMALL = int(os.environ.get("SKEW_N_SMALL", "6400"))
SMALL_LEN = 500
N_GIANT = int(os.environ.get("SKEW_N_GIANT", "8"))
GIANT_LEN = int(os.environ.get("SKEW_GIANT_LEN", "1500000"))
THRESHOLD = 100_000
N_RUNS = int(os.environ.get("SKEW_RUNS", "2"))

CFG = FeatureConfig.multi_interval(multiplier_1=3, multiplier_2=12,
                                   atr_period=14)


def build_corpus(spark, path: str) -> None:
    """Deterministic heavy-tailed doc-grain corpus: N_SMALL docs of
    SMALL_LEN tokens + N_GIANT giants of GIANT_LEN, shuffled.  Written
    straight through pyarrow (a Spark createDataFrame of multi-million
    element lists would row-convert for minutes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    lens, ids = [], []
    for i in range(N_SMALL):
        ids.append(f"d{i:06d}")
        lens.append(SMALL_LEN)
    for g in range(N_GIANT):
        ids.append(f"g{g:02d}")
        lens.append(GIANT_LEN)
    order = rng.permutation(len(ids))
    ids = [ids[i] for i in order]
    lens = np.asarray([lens[i] for i in order], dtype=np.int64)
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    flat = np.empty(offs[-1], dtype=np.int32)
    for i, (s, ln) in enumerate(zip(offs[:-1], lens)):
        flat[s:s + ln] = ((np.arange(ln, dtype=np.int64) * 2654435761 + i)
                          % 50000).astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                      pa.array(flat))
    tbl = pa.table({
        "source": pa.array(["s0"] * len(ids)),
        "doc_id": pa.array(ids),
        "tokens": tokens,
        "n_tok": pa.array(lens.astype(np.int32)),
    })
    os.makedirs(path, exist_ok=True)
    pq.write_table(tbl, f"{path}/part-0.parquet")


def partition_masses(df) -> list[int]:
    pm = (df.select("n_tok", F.spark_partition_id().alias("pid"))
          .groupBy("pid").agg(F.sum("n_tok").alias("mass"))
          .toPandas())
    return sorted(int(m) for m in pm["mass"])


def run_job(df) -> float:
    t0 = time.time()
    n = features_checksum(df, CFG).agg(F.sum("n_rows")).collect()[0][0]
    assert n == N_SMALL * SMALL_LEN + N_GIANT * GIANT_LEN, n
    return time.time() - t0


def main() -> int:
    spark = build_session(app="bench_skew", master=f"local[{CPUS}]",
                         shuffle_partitions=CPUS)
    path = "/tmp/skew_corpus/documents.parquet"
    if not os.path.exists(path):
        build_corpus(spark, path)
    doc = spark.read.parquet(path)

    # the COLLISION case the tier exists to prevent: hash-partition on a
    # salted key whose salt is chosen (deterministically, driver-side)
    # so that two giants land in the same partition — round-robin
    # happens to spread the giants on this corpus (r4 re-measurement),
    # so without this layout the worst case would stay theoretical
    giant_ids = [r["doc_id"] for r in
                 doc.filter(F.col("n_tok") > THRESHOLD)
                 .select("doc_id").collect()]
    probe = spark.createDataFrame([(g,) for g in giant_ids],
                                  "doc_id string")
    collide_salt = None
    for salt in range(64):
        buckets = [r["b"] for r in probe.select(
            F.pmod(F.xxhash64("doc_id", F.lit(salt)), F.lit(CPUS))
            .alias("b")).collect()]
        if len(set(buckets)) < len(buckets):
            collide_salt = salt
            break
    assert collide_salt is not None

    layouts = {
        "single_tier_roundrobin": lambda: doc.repartition(CPUS),
        "single_tier_colliding": lambda: doc.repartition(
            CPUS, F.xxhash64("doc_id", F.lit(collide_salt))),
        "two_tier_oversized": lambda: tiered_repartition(doc, CPUS,
                                                         THRESHOLD),
    }
    out = {"cpus": CPUS, "n_small": N_SMALL, "small_len": SMALL_LEN,
           "n_giant": N_GIANT, "giant_len": GIANT_LEN,
           "threshold": THRESHOLD, "layouts": {}}
    for name, make in layouts.items():
        df = make()
        masses = partition_masses(make())
        walls = []
        run_job(make())                      # warm-up
        for _ in range(N_RUNS):
            walls.append(run_job(make()))
        out["layouts"][name] = {
            "n_partitions": len(masses),
            "max_partition_tokens": masses[-1],
            "median_partition_tokens": masses[len(masses) // 2],
            "top4_partition_tokens": masses[-4:],
            "wall_sec_min": round(min(walls), 3),
            "walls": [round(w, 3) for w in walls],
        }
        print(name, out["layouts"][name])
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/skew.json", "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
