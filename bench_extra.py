"""Extra benchmarks for optimization work (bench.py is FROZEN).

Reproduces bench.py's exact per-query timing protocol (noop sink,
best-of-2 with noisy-pair retries) over an arbitrary subset of declared
queries, and optionally captures .explain("formatted") for each, so
optimization rounds can isolate and attribute per-query costs without
touching the frozen harness.

Usage:
    python bench_extra.py [--queries a,b,c] [--runs N] [--plans DIR] \
        [--repeat R]

Environment: same contract as bench.py ($SPARK_GRAFT_SF_DIR,
$SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "extract_metrics",
    "extract_markdown",
    "dedup_exact",
    "dedup_minhash_candidates",
    "dedup_embedding",
    "text_quality",
    "text_fingerprint",
    "sim_cosine_topk",
    "events_sessions",
    "corpus_curation",
    "metrics_by_lang",
]


def _session(cores: int):
    from pyspark.sql import SparkSession

    from html2text_spark.pipeline import recommended_session_conf

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"bench-extra-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
    )
    for k, v in recommended_session_conf().items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(HEADLINE))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--max-runs", type=int, default=4)
    ap.add_argument("--plans", default=None, help="dir for explain dumps")
    ap.add_argument(
        "--plan-suffix", default="before", help="plans/<q>_<suffix>.txt"
    )
    args = ap.parse_args()

    import __spark_entry__ as entry_mod

    spark = _session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    names = [q for q in args.queries.split(",") if q]

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            df = queries[name](spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(args.plans, f"{name}_{args.plan_suffix}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())

    results = {}
    samples = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        walls = []
        for _ in range(args.runs):
            t0 = time.time()
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(time.time() - t0)
        while (
            len(walls) < args.max_runs
            and sorted(walls)[1] > 1.25 * sorted(walls)[0]
        ):
            t0 = time.time()
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(time.time() - t0)
        results[name] = round(min(walls), 3)
        samples[name] = [round(w, 3) for w in walls]
        print(f"[bench_extra] {name}: {results[name]}s {samples[name]}",
              file=sys.stderr)
    spark.stop()
    print(json.dumps({
        "value": round(sum(results.values()), 3),
        "queries": results,
        "samples": samples,
        "sf_dir": SF_DIR,
        "cpus": CPUS,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
