"""Operator benchmark suite: the LLM-pipeline operators (dedup / ANN /
curation / multimodal) timed at sf0.1 — separate from bench.py's
comparability-pinned headline suite (VERDICT r3 item 3: the scale claims
in the operator docstrings need numbers).

Methodology mirrors BENCH/BASELINE.md: one warm-up pass per query
(excluded), then min-of-N wall times with the max-min spread recorded,
noop sink (full computation, no driver materialization).  Run on a
quiet host (`cat /proc/loadavg` first); wall times vary 3-8x with
neighbor load.

Usage: python tools/bench_operators.py [--runs N] [--out FILE]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS (default 32)

Prints ONE JSON line and (with --out) writes it to a file.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: the operators whose 100 TB design claims get measured here; key ->
#: catalog query name
OPERATOR_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "dedup_canonicalize",
    "corpus_curation_neardup",
    "corpus_curation_quantile",
    "ann_ivf_topk",
    "dedup_embedding_cosine",
    "multimodal_audio_stats",
    "multimodal_image_stats",
    "dedup_chunk_crossdoc",
    "text_repetition",
    "corpus_domain_mix",
    "contamination_check",
    "corpus_sample_stratified",
    "sequence_packing",
    "tfidf_topk",
    "lm_bigram_surprisal",
    "corpus_mix_sample",
    "quality_classifier",
    "corpus_shuffle",
    "pii_scrub",
    "bpe_pair_stats",
    "embedding_covariance",
    "dedup_chunk_clean",
    "bpe_encode",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "dedup_incremental",
    "train_val_kl",
    "dedup_semantic",
    "knn_graph",
    "bm25_search",
    "hard_negative_mining",
    "ann_ivfpq_rerank",
    "dsir_select",
    "embedding_standardize",
    "decontaminate",
    "doc_chunk_overlap",
    "dedup_edit_distance",
    "dedup_cdc_chunks",
    "dedup_substring_spans",
    "dedup_substring_clean",
    "hybrid_search_rrf",
    "knn_graph_multiprobe",
    "ann_sq_topk",
    "ann_ivfpq_residual_topk",
    "bpe_train_merges",
    "embedding_random_projection",
    "corpus_ngram_topk",
    "ann_rp_topk",
    "dedup_jaccard_groundtruth",
    "corpus_sample_weighted",
    "dedup_containment_lsh",
    "bpe_train_encode",
    "events_funnel",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of OPERATOR_QUERIES "
                         "(e.g. the doc-table ops for the sf1 scale run)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    from atr_adaptive_laguerre_spark.engine.session import build_session
    from atr_adaptive_laguerre_spark.queries import QUERIES

    spark = build_session(app="bench-operators", master=f"local[{cpus}]",
                          shuffle_partitions=max(2 * cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    rows_out: dict[str, int] = {}

    names = OPERATOR_QUERIES
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
        unknown = set(names) - set(OPERATOR_QUERIES)
        assert not unknown, f"not in OPERATOR_QUERIES: {sorted(unknown)}"

    for name in names:
        fn = QUERIES[name]
        # warm-up (JVM codegen + Python worker pools), and record the
        # output cardinality once — for the pair queries this IS the
        # candidate-density evidence (pairs << n^2)
        rows_out[name] = fn(spark, sf_dir).count()
        times = []
        for _ in range(args.runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        timings[name] = round(min(times), 3)
        spreads[name] = round(max(times) - min(times), 3)
        print(f"# {name}: min {timings[name]}s "
              f"(spread {spreads[name]}s, rows {rows_out[name]})",
              file=sys.stderr)

    out = {
        "metric": "LLM-pipeline operator suite wall time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_spread": spreads,
        "rows_out": rows_out,
        "runs_per_query": args.runs,
        "sf": sf,
        "n_docs": n_docs,
        "cpus": cpus,
        "pair_density_simhash": round(
            rows_out["dedup_simhash_pairs"]
            / (n_docs * (n_docs - 1) / 2), 6)
        if n_docs > 1 and "dedup_simhash_pairs" in timings else None,
    }
    spark.stop()
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
