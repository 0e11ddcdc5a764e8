"""MinHash-LSH band/row tuning curve — measured recall & candidate
efficiency vs the analytic S-curve, for the dedup candidate generator.

Ground truth is the EXHAUSTIVE near-dup pair list
(``exact_jaccard_pairs``: exact Jaccard over every doc pair sharing a
shingle — no LSH, no sampling).  For each (K minhashes, b bands)
operating point the script measures, over the LSH candidate pairs of
``_lsh_candidate_pairs(docs, n_hashes=K, n_bands=b)``:

* recall        — |candidates ∩ true pairs| / |true pairs|
  (true = exact Jaccard >= JACCARD_THRESHOLD);
* precision     — |candidates that are true pairs| / |candidates|
  (the fraction of the expensive exact-verify work that pays off);
* n_candidates  — the verify workload the config generates;
* expected_recall — the ANALYTIC value E[1 - (1 - J^r)^b] averaged
  over the true pairs' actual Jaccards (the standard LSH S-curve,
  r = K/b).  Measured recall should track this closely: a gap means
  the minhash streams are correlated (a hashing bug), not just an
  unlucky draw.
* wall_s        — min-of-RUNS noop-sink wall for the candidate query.

The point of the artifact: bands/rows is the ONE knob of the 100 TB
dedup candidate generator — more bands with fewer rows raises recall
at threshold-edge pairs but multiplies the candidate (verify) load;
the catalog's pinned (K=12, b=4, r=3) point is chosen from this
measured curve, not guessed.

Writes BENCH/lsh_tuning.json.  Usage:
    python tools/bench_lsh_tuning.py    (quiet host; sf0.01 default —
    the ground truth is quadratic per hot shingle, so the exhaustive
    baseline stays at the driver-gate scale)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
#: (K minhashes, b bands) grid; r = K/b rows per band.  K tops out at
#: 16: the Carter-Wegman stream h1 + k*h2 must stay inside signed-64
#: (h1 + (K-1)*h2 < K * 2^59), which holds up to K = 16 exactly —
#: larger K needs a smaller modulus, a different production trade.
GRID = ((12, 1), (12, 2), (12, 3), (12, 4), (12, 6), (12, 12),
        (16, 4), (16, 8), (8, 4))
RUNS = 2


def main() -> None:
    from atr_adaptive_laguerre_spark.engine.session import build_session
    from atr_adaptive_laguerre_spark.operators.dedup import (
        JACCARD_THRESHOLD, LSH_BANDS, MINHASH_K, _docs,
        _lsh_candidate_pairs, exact_jaccard_pairs,
    )

    spark = build_session(app="lsh-tuning", master="local[32]",
                          shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    docs = _docs(spark, SF_DIR)
    t0 = time.perf_counter()
    truth_rows = exact_jaccard_pairs(docs).collect()
    truth_wall = round(time.perf_counter() - t0, 3)
    truth = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in truth_rows}
    print(f"ground truth: {len(truth)} pairs with J>={JACCARD_THRESHOLD} "
          f"[{truth_wall}s exhaustive]", flush=True)

    out: dict = {"sf_dir": SF_DIR, "n_docs": docs.count(),
                 "jaccard_threshold": JACCARD_THRESHOLD,
                 "n_true_pairs": len(truth),
                 "groundtruth_wall_s": truth_wall,
                 "catalog_point": {"n_hashes": MINHASH_K,
                                   "n_bands": LSH_BANDS},
                 "runs": RUNS, "curve": []}
    for n_hashes, n_bands in GRID:
        r = n_hashes // n_bands
        cand_df = _lsh_candidate_pairs(docs, n_hashes=n_hashes,
                                       n_bands=n_bands)
        cand = {(row["doc_a"], row["doc_b"]) for row in cand_df.collect()}
        hit = sum(1 for p in truth if p in cand)
        recall = hit / len(truth) if truth else 1.0
        precision = (sum(1 for p in cand if p in truth) / len(cand)
                     if cand else 1.0)
        exp_recall = (sum(1.0 - (1.0 - j ** r) ** n_bands
                          for j in truth.values()) / len(truth)
                      if truth else 1.0)
        walls = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            cand_df.write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        row = {"n_hashes": n_hashes, "n_bands": n_bands, "rows_per_band": r,
               "n_candidates": len(cand),
               "recall": round(recall, 4),
               "expected_recall": round(exp_recall, 4),
               "precision": round(precision, 4),
               "wall_s": round(min(walls), 3)}
        out["curve"].append(row)
        print(f"K={n_hashes} b={n_bands} r={r}: recall={recall:.3f} "
              f"(analytic {exp_recall:.3f}) precision={precision:.3f} "
              f"cands={len(cand)}", flush=True)

    path = os.path.join(REPO, "BENCH", "lsh_tuning.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
