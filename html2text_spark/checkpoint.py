"""Resumable extraction runs: per-partition lineage manifests + anti-join.

north_rule requirement: the job "checkpoints per-partition progress with
lineage + extraction metrics (docs/sec, spans/doc, malformed-HTML rate) to
allow resume".

Layout of a run directory:

    <output>/
      data/bucket=N/*.parquet      extracted rows, hash-bucketed by doc_id
      _manifests/part-N.json       one manifest per completed bucket

Bucket = pmod(xxhash64(doc_id), num_buckets): deterministic, so a resumed
run recomputes exactly the missing buckets regardless of the input's
physical layout.  Buckets are processed in *waves*: one input scan per
wave (not per bucket), written with dynamic-partition overwrite so a
crashed wave is simply re-run; a manifest is only published after its
bucket's data is committed (write tmp + atomic rename), so manifests are
never ahead of data.  On a real cluster the same structure maps onto
Iceberg: bucket -> partition spec bucket(doc_id, N), manifest -> snapshot
summary properties.

Each manifest records lineage (input identifier, code version, config
fingerprint) and the bucket's extraction metrics, satisfying the
north_rule's resume + metrics requirements.
"""

from __future__ import annotations

import json
import os
import time
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core.config import Config
from .pipeline import extract

CODE_VERSION = "html2text_spark-0.1"


def _config_fingerprint(cfg: Optional[Config]) -> str:
    cfg = cfg or Config()
    import hashlib

    fields = {k: repr(v) for k, v in vars(cfg).items() if k != "tag_callback"}
    # callbacks change conversion output like any other option: record
    # identity (qualname) so a resume with a different callback is refused
    cb = cfg.tag_callback
    fields["tag_callback"] = getattr(cb, "__qualname__", repr(cb)) if cb else "none"
    payload = repr(sorted(fields.items()))
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def completed_buckets(output_path: str) -> List[int]:
    manifest_dir = os.path.join(output_path, "_manifests")
    if not os.path.isdir(manifest_dir):
        return []
    done = []
    for fname in os.listdir(manifest_dir):
        if fname.startswith("part-") and fname.endswith(".json"):
            done.append(int(fname[len("part-") : -len(".json")]))
    return sorted(done)


def _bucket_col(num_buckets: int):
    return F.pmod(F.xxhash64("doc_id"), F.lit(num_buckets)).cast("int")


def run_extraction_checkpointed(
    spark: SparkSession,
    documents: DataFrame,
    output_path: str,
    cfg: Optional[Config] = None,
    num_buckets: int = 32,
    buckets_per_wave: Optional[int] = None,
    input_lineage: str = "",
) -> dict:
    """Run (or resume) a bucketed extraction with per-bucket manifests.

    Raises ValueError when resuming into an output directory whose run
    metadata (bucket count, config fingerprint, input lineage) does not
    match -- mixing incompatible bucketings would silently drop or
    duplicate documents.
    """
    os.makedirs(os.path.join(output_path, "_manifests"), exist_ok=True)
    fingerprint = _config_fingerprint(cfg)
    run_meta_path = os.path.join(output_path, "_manifests", "_run.json")
    run_meta = {
        "num_buckets": num_buckets,
        "config_fingerprint": fingerprint,
        "input": input_lineage,
        "code_version": CODE_VERSION,
    }
    if os.path.exists(run_meta_path):
        with open(run_meta_path) as f:
            existing = json.load(f)
        mismatches = {
            k: (existing.get(k), v)
            for k, v in run_meta.items()
            if k != "code_version" and existing.get(k) != v
        }
        if mismatches:
            raise ValueError(
                "refusing to resume into %s: run parameters changed %r"
                % (output_path, mismatches)
            )
    else:
        tmp = run_meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(run_meta, f)
        os.replace(tmp, run_meta_path)

    done = set(completed_buckets(output_path))
    todo = [b for b in range(num_buckets) if b not in done]
    buckets_per_wave = buckets_per_wave or max(1, len(todo))
    data_root = os.path.join(output_path, "data")

    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    summary = {"resumed_buckets": sorted(done), "ran_buckets": [], "docs": 0}
    try:
        for wave_start in range(0, len(todo), buckets_per_wave):
            wave = todo[wave_start : wave_start + buckets_per_wave]
            t0 = time.time()
            part = documents.filter(_bucket_col(num_buckets).isin(wave))
            extracted = extract(part, cfg).withColumn(
                "bucket", _bucket_col(num_buckets)
            )
            extracted.write.mode("overwrite").partitionBy("bucket").parquet(
                data_root
            )
            wall = time.time() - t0
            # per-bucket metrics recomputed from the committed output
            # (exactly-once).  Read ONLY this wave's bucket directories --
            # a full data_root scan would re-list every completed bucket
            # each wave (quadratic listing on object stores) -- and skip
            # buckets that held no documents (no directory written)
            # instead of swallowing real read errors
            wave_paths = [
                os.path.join(data_root, "bucket=%d" % b)
                for b in wave
                if os.path.isdir(os.path.join(data_root, "bucket=%d" % b))
            ]
            if wave_paths:
                stats_rows = (
                    spark.read.option("basePath", data_root)
                    .parquet(*wave_paths)
                    .groupBy("bucket")
                    .agg(
                        F.count("*").alias("docs"),
                        F.sum("metrics.spans").alias("spans_total"),
                        F.sum("metrics.bytes_in").alias("bytes_in_total"),
                        F.sum(F.col("metrics.malformed").cast("int")).alias(
                            "malformed_docs"
                        ),
                    )
                    .collect()
                )
            else:
                stats_rows = []
            stats_by_bucket = {r["bucket"]: r.asDict() for r in stats_rows}
            for bucket in wave:
                stats = stats_by_bucket.get(
                    bucket,
                    {"docs": 0, "spans_total": 0, "bytes_in_total": 0, "malformed_docs": 0},
                )
                docs = int(stats.get("docs") or 0)
                manifest = {
                    "bucket": bucket,
                    "lineage": {
                        "input": input_lineage,
                        "code_version": CODE_VERSION,
                        "config_fingerprint": fingerprint,
                    },
                    "metrics": {
                        "docs": docs,
                        "spans_total": int(stats.get("spans_total") or 0),
                        "bytes_in_total": int(stats.get("bytes_in_total") or 0),
                        "malformed_docs": int(stats.get("malformed_docs") or 0),
                        "wave_wall_sec": wall,
                        "docs_per_sec": docs / wall if wall > 0 else 0.0,
                    },
                    "completed_at": time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                    ),
                }
                manifest_path = os.path.join(
                    output_path, "_manifests", "part-%d.json" % bucket
                )
                tmp_path = manifest_path + ".tmp"
                with open(tmp_path, "w") as f:
                    json.dump(manifest, f)
                os.replace(tmp_path, manifest_path)
                summary["ran_buckets"].append(bucket)
                summary["docs"] += docs
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    return summary


def read_extracted(spark: SparkSession, output_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_path, "data"))


def resume_filter(documents: DataFrame, extracted_done: DataFrame) -> DataFrame:
    """Row-level resume: drop documents already present in the output.

    left_anti join on doc_id; with AQE on, the done-side is broadcast when
    small, else a shuffled anti-join -- both correct at any scale.
    """
    return documents.join(
        extracted_done.select("doc_id"), on="doc_id", how="left_anti"
    )
