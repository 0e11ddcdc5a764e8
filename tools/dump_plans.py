"""Dump the formatted physical plans of the headline catalog queries to
BENCH/PLANS.md — standing evidence that each plan is the one you'd want
at 100 TB (pushdown, pruning, broadcast choices, exchange counts), not
just the first one that passed.

The automated guards live in tests/test_plan_quality.py; this artifact
is the human-readable companion.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

#: (query, what the plan must show)
PLAN_NOTES = {
    "pricing_summary": "filter pushed to the parquet scan (PushedFilters) "
                       "+ 6-of-11 column pruning (ReadSchema); partial agg "
                       "before the exchange",
    "star_join_revenue": "all three dimensions broadcast — zero "
                         "shuffle-joins",
    "events_rolling_stats": "ONE exchange on user_id shared by every "
                            "window function",
    "asof_join_orders": "union + window as-of: one exchange on the key, "
                        "no per-row Python, no range-join explosion",
    "feature_ic_sweep": "one exchange on doc_id (close + fwd windows), "
                        "one Expand (121-way unpivot), one exchange on "
                        "feature shared by both ranks and the final agg; "
                        "no joins",
    "dedup_minhash_lsh": "explode + one shuffle on (band, bucket) — "
                         "linear candidate generation, no corpus "
                         "self-join",
    "ann_ivf_topk": "codebook broadcast; assignment = one corpus scan; "
                    "probe join shuffles on cell",
    "corpus_curation": "exactly two exchanges (dedup window + report "
                       "groupBy), all expressions JVM-side",
    "features_121_multi_interval": "zero-shuffle scan path: parquet scan "
                                   "-> mapInArrow (the fused kernel) -> "
                                   "output; parallelism from file splits",
    "dedup_simhash_pairs": "64-bit fingerprint aggregation + 4x16-bit "
                           "band explode + one (band, bucket) shuffle — "
                           "65,536 buckets/band, quadratic only within "
                           "a bucket",
    "corpus_curation_neardup": "drop-set joined on doc_id with NO "
                               "broadcast hint — AQE picks the strategy "
                               "(the set is corpus-proportional on "
                               "dup-heavy corpora)",
    "corpus_sample_stratified": "stateless per-row assignment; the "
                                "report groupBy is the ONLY exchange, "
                                "no join anywhere",
    "contamination_check": "benchmark shingle set joined on the shingle "
                           "key, folded back per doc_id — no corpus "
                           "self-join, no cartesian",
    "ann_pq_topk": "PQ codebook and per-query LUTs broadcast; scoring "
                   "is ONE broadcast nested-loop join whose per-row "
                   "work is 4 array lookups in codegen — the corpus's "
                   "original vectors never re-read at query time",
    "ann_ivfpq_topk": "IVF cells + PQ codes joined once on vec_id "
                      "(shuffled hash join, no SMJ sort); probes "
                      "broadcast onto the cell-keyed inverted lists; "
                      "LUT broadcast — no corpus self-join",
    "dedup_chunk_clean": "one chunk-hash exchange (the keep-first "
                         "window), ONE doc_id groupBy carrying counts "
                         "AND the cleaned body — the explode+window "
                         "pipeline runs once, not per branch",
    "dedup_semantic": "codebook broadcast for assignment; the pairwise "
                      "stage is ONE cell-keyed self-join (quadratic "
                      "only within a cell — k scales with the corpus); "
                      "trailing per-id joins unhinted so AQE sizes "
                      "them",
    "knn_graph": "same shape as dedup_semantic: broadcast codebook, "
                 "cell-keyed self-join, one vec_id-keyed window for "
                 "the top-K rank — corpus-wide output, no query-set "
                 "crossJoin",
    "ann_ivfpq_rerank": "ADC shortlist bounded at queries x r_cand, so "
                        "the exact-rerank vector fetch is a broadcast "
                        "join against one corpus scan — full vectors "
                        "touched only for shortlisted rows",
    "dsir_select": "one explode feeds the only corpus-mass shuffle "
                   "(doc_id x bucket groupBy); both n-gram LMs from a "
                   "single conditional-sum aggregate broadcast back; "
                   "global top-N is TakeOrderedAndProject, never a "
                   "global sort",
    "embedding_standardize": "posexplode -> 64-row d-keyed stats "
                             "broadcast back onto the exploded frame "
                             "(BroadcastHashJoin) — no self-join, no "
                             "corpus-sized window; trailing orderBy is "
                             "presentation only",
    "decontaminate": "eval-suite-sized benchmark shingle set joined on "
                     "the shingle key, folded to per-doc hit counts — "
                     "no corpus self-join; AQE sizes the benchmark "
                     "join (broadcast in the normal case)",
    "dedup_edit_distance": "O(len^2) Levenshtein runs ONLY on the LSH "
                           "candidate pairs (linear generation); text "
                           "fetch is two id-keyed joins — never "
                           "corpus x corpus",
    "dedup_cdc_chunks": "content-defined chunking is explode -> per-doc "
                        "prefix-sum window -> two groupBys: strictly "
                        "linear, ZERO joins in the whole plan",
    "dedup_substring_spans": "gram stream ~1 row/word; ONE gram-hash "
                             "exchange counts occurrences (window, no "
                             "self-join); coverage explodes DUP spans "
                             "only; report joins ride doc_id",
    "knn_graph_multiprobe": "probe ranking on the broadcast codebook; "
                            "candidate expansion is one cell-keyed "
                            "equi-join at nprobe x same-cell cost — "
                            "corpus x corpus never appears",
    "ann_sq_topk": "O(d) min/max stats row + query set both broadcast; "
                   "encode/reconstruct are codegen array transforms; "
                   "no shuffled join anywhere",
    "ann_ivfpq_residual_topk": "residual encoding adds NO shuffle: one "
                               "cell-keyed probe join as raw ivfpq; "
                               "centroids/codebooks/per-cell LUTs all "
                               "broadcast; normalization + residual "
                               "subtraction ride the scan in codegen",
    "embedding_random_projection": "pure per-row Catalyst expression — "
                                   "zero exchanges, zero joins, zero "
                                   "Python; the 100 TB dim-reduction "
                                   "map stage",
    "corpus_ngram_topk": "one gram-hash exchange + partial agg; "
                         "global top-N as TakeOrderedAndProject "
                         "(no range-partition sort)",
    "ann_rp_topk": "stage-1 corpus stream carries only (cand_id, "
                   "k bigints) — the 64-d vector re-enters via "
                   "broadcast id-joins in the rerank stage; no SMJ, "
                   "one BroadcastNestedLoopJoin (the 20-query "
                   "broadcast)",
    "dedup_jaccard_groundtruth": "the exhaustive baseline: "
                                 "shingle-EQUALITY self-join (never a "
                                 "cartesian) + (doc_a, doc_b) groupBy "
                                 "— the documented quadratic-per-hot-"
                                 "shingle harness the LSH curve is "
                                 "tuned against",
    "events_json_extract": "get_json_object stays in codegen on the "
                           "scan's map side; partial agg before the "
                           "one group-key exchange; no Python",
    "hybrid_search_rrf": "sparse list = posting-filtered BM25 "
                         "TakeOrdered top-R (localCheckpoint: ONE "
                         "corpus scan for its two consumers); dense "
                         "list = 1-row PRF query broadcast over one "
                         "embeddings scan; fusion = full-outer join "
                         "of two R-row lists on doc_id",
    "dedup_substring_clean": "keep-first rank on the gram-hash window; "
                             "removal = (doc, pos)-keyed LEFT ANTI join "
                             "of the word stream against the removed "
                             "set (bounded by dup mass); one doc-keyed "
                             "re-assembly groupBy",
}


def main() -> int:
    from atr_adaptive_laguerre_spark.engine.session import build_session
    from atr_adaptive_laguerre_spark.queries import QUERIES

    spark = build_session(app="plans", master="local[4]",
                          shuffle_partitions=4)
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "PLANS.md")
    with open(out_path, "w") as f:
        f.write("# Physical plans of the headline queries\n\n"
                "Generated by `tools/dump_plans.py` (sf0.001, local[4]; "
                "plan SHAPE is what matters — row counts are not).  "
                "Automated guards: `tests/test_plan_quality.py`.\n")
        from atr_adaptive_laguerre_spark.queries import BENCH_QUERY_BODIES

        jvm = spark.sparkContext._jvm
        for name, note in PLAN_NOTES.items():
            # _ordered queries truncate their public plan at the
            # localCheckpoint (r6); dump the pre-ORDER-BY body, which
            # carries the physical shape the note describes
            fn = BENCH_QUERY_BODIES.get(name, QUERIES[name])
            df = fn(spark, SF)
            plan = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            f.write(f"\n## {name}\n\n**Why this plan survives 100x:** "
                    f"{note}\n\n```\n{plan}\n```\n")
    spark.stop()
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
