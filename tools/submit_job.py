"""spark-submit entry point for the resumable feature job.

Package the library and submit:

    python tools/make_pyfiles.py                       # -> dist/atr_adaptive_laguerre_spark.zip
    spark-submit --master local[32] \\
        --py-files dist/atr_adaptive_laguerre_spark.zip \\
        tools/submit_job.py \\
        --input /path/tokens.parquet \\
        --output /path/features \\
        --manifest /path/manifest \\
        --run-id nightly-2026-08-16 \\
        --multi-interval --n-buckets 64 --buckets-per-wave 8

Re-submitting with the same --run-id resumes from the manifest.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--atr-period", type=int, default=14)
    ap.add_argument("--multi-interval", action="store_true")
    ap.add_argument("--multiplier-1", type=int, default=3)
    ap.add_argument("--multiplier-2", type=int, default=12)
    ap.add_argument("--availability", action="store_true")
    ap.add_argument("--snapshot-id", type=int, default=None,
                    help="pin an Iceberg snapshot (table inputs only)")
    ap.add_argument("--columns", default=None,
                    help="comma-separated feature columns to ship "
                         "(worker-side projection; default all)")
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--buckets-per-wave", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from atr_adaptive_laguerre_spark.config import FeatureConfig
    from atr_adaptive_laguerre_spark.engine.manifest import run_resumable
    from atr_adaptive_laguerre_spark.engine.sources import read_sequences

    spark = SparkSession.builder.appName(
        "atr-adaptive-laguerre-features").getOrCreate()

    if args.multi_interval:
        cfg = FeatureConfig.multi_interval(
            multiplier_1=args.multiplier_1, multiplier_2=args.multiplier_2,
            atr_period=args.atr_period, availability=args.availability)
    else:
        cfg = FeatureConfig(atr_period=args.atr_period)

    # --input: Iceberg/catalog table reference OR parquet path
    doc_df = read_sequences(spark, args.input,
                            snapshot_id=args.snapshot_id)
    cols = args.columns.split(",") if args.columns else None
    summary = run_resumable(
        spark, doc_df, cfg, args.output, args.manifest,
        run_id=args.run_id, n_buckets=args.n_buckets,
        buckets_per_wave=args.buckets_per_wave, columns=cols)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
