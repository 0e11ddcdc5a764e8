"""spark-submit entry point for the composed corpus-preparation job
(`engine/corpus_job.prepare_corpus`): quality/dup gates -> near-dup
canonicalization -> PII scrub -> deterministic shuffle -> packing
offsets -> sharded parquet write with per-stage manifest lineage.

    python tools/make_pyfiles.py     # -> dist/atr_adaptive_laguerre_spark.zip
    spark-submit --master local[32] \\
        --py-files dist/atr_adaptive_laguerre_spark.zip \\
        tools/prepare_corpus.py \\
        --input /path/documents.parquet \\
        --output /path/corpus \\
        --manifest /path/manifest \\
        --run-id nightly-2026-08-17 \\
        --min-tokens 20 --min-quality 0.38
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# local-python convenience; under spark-submit the zip on --py-files
# provides the package and this is a no-op
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from atr_adaptive_laguerre_spark.operators.curation import (
        MIN_QUALITY, MIN_TOKENS, SEQ_LEN,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--manifest", default=None)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--min-tokens", type=int, default=MIN_TOKENS)
    ap.add_argument("--min-quality", type=float, default=MIN_QUALITY)
    ap.add_argument("--seq-len", type=int, default=SEQ_LEN)
    ap.add_argument("--no-near-dup", action="store_true")
    ap.add_argument("--chunk-dedup", action="store_true",
                    help="RefinedWeb-style sub-document pass: remove "
                         "globally-duplicated fixed-width chunks from "
                         "kept docs")
    ap.add_argument("--decontaminate", action="store_true",
                    help="drop training docs sharing any distinct word "
                         "8-gram with the eval benchmark (source == "
                         "BENCHMARK_SOURCE), and exclude the benchmark "
                         "docs from the training output")
    ap.add_argument("--dsir-frac", type=float, default=None,
                    help="DSIR domain-targeted selection: keep this top "
                         "fraction of gated docs by hashed-ngram "
                         "importance weight toward --dsir-sources")
    ap.add_argument("--dsir-sources", default=None,
                    help="comma-separated target-domain sources for "
                         "--dsir-frac (default: the catalog's "
                         "DSIR_TARGET_SOURCES)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from atr_adaptive_laguerre_spark.engine.corpus_job import (
        prepare_corpus,
    )
    from atr_adaptive_laguerre_spark.engine.sources import read_sequences

    spark = SparkSession.builder.appName("prepare-corpus").getOrCreate()
    docs = read_sequences(spark, args.input)
    summary = prepare_corpus(
        spark, docs, args.output, manifest_dir=args.manifest,
        run_id=args.run_id, min_tokens=args.min_tokens,
        min_quality=args.min_quality, near_dup=not args.no_near_dup,
        chunk_dedup=args.chunk_dedup, decontaminate=args.decontaminate,
        dsir_frac=args.dsir_frac,
        dsir_target_sources=(tuple(args.dsir_sources.split(","))
                             if args.dsir_sources else None),
        seq_len=args.seq_len)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
