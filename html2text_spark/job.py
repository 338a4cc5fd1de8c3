"""Production job entrypoint.

Usage (cluster; run_job.py is the submittable wrapper because this
module uses package-relative imports):
    spark-submit --py-files html2text_spark.zip run_job.py \\
        --input iceberg:warehouse.docs --output s3://bucket/run1 \\
        --buckets 4096

Usage (sandbox smoke):
    python3 -m html2text_spark.job --synthetic 1000 --output /tmp/run1 --buckets 8

Reads the interleaved documents table, runs the checkpointed extraction
(resuming any completed buckets), and prints a one-line JSON summary with
corpus metrics.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="html2text_spark extraction job")
    parser.add_argument("--input", help="documents table path (parquet or iceberg:)")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="generate N synthetic documents instead of --input")
    parser.add_argument("--output", required=True, help="run directory")
    parser.add_argument("--buckets", type=int, default=32)
    parser.add_argument("--waves", type=int, default=None,
                        help="buckets per wave (default: all pending in one wave)")
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args(argv)

    from pyspark.sql import SparkSession

    from .checkpoint import read_extracted, run_extraction_checkpointed
    from .pipeline import extraction_metrics, recommended_session_conf
    from .sources import read_documents, synthetic_documents

    builder = SparkSession.builder.appName("html2text_spark-extract")
    for k, v in recommended_session_conf().items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.synthetic:
        docs = synthetic_documents(spark, args.synthetic, seed=args.seed)
        lineage = "synthetic:n=%d,seed=%d" % (args.synthetic, args.seed)
    elif args.input:
        docs = read_documents(spark, args.input)
        lineage = args.input
    else:
        parser.error("one of --input / --synthetic is required")
        return 2

    t0 = time.time()
    summary = run_extraction_checkpointed(
        spark,
        docs,
        args.output,
        num_buckets=args.buckets,
        buckets_per_wave=args.waves,
        input_lineage=lineage,
    )
    wall = time.time() - t0
    metrics = extraction_metrics(read_extracted(spark, args.output)).collect()[0]

    result = {
        "resumed_buckets": len(summary["resumed_buckets"]),
        "ran_buckets": len(summary["ran_buckets"]),
        "docs_this_run": summary["docs"],
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(summary["docs"] / wall, 2) if wall > 0 else 0.0,
        "corpus": {
            "docs": int(metrics["docs"]),
            "spans_per_doc": round(float(metrics["spans_per_doc"]), 3),
            "malformed_rate": float(metrics["malformed_rate"]),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
