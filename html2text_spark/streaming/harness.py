"""Finite-input streaming completion harness, shared by every
streamed-vs-oracle query (sessions, windowed rollup, dedup).

Stages the finite DataFrame as ONE parquet file and runs the stream over
it with Trigger.AvailableNow into a memory sink.  The single file is
load-bearing: the file source admits one file's rows atomically, so
exactly one micro-batch sees all data -- a multi-file stage could admit
watermark-advancing rows (the far-future clock events the completion
tricks append) BEFORE real events, jumping the watermark and silently
dropping the rest as late.  Centralizing the staging keeps that
invariant in one place instead of one copy per streaming operator.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import tempfile
from typing import Callable, Optional

from pyspark.sql import DataFrame


@contextlib.contextmanager
def _state_partitions(spark):
    """Pin the stream's state-store partition count for the query run.

    A streaming query creates one state store instance per shuffle
    partition PER stateful operator (a stream-stream join keeps four),
    and every micro-batch commits a delta file per instance -- so the
    partition count should track STATE VOLUME, not the batch session's
    core count.  ``spark.html2text.stream.statePartitions`` overrides it
    (a deployment with large keyed state raises it); the default of 8
    fits the finite harness's per-group state at any tested SF (state
    rows ~ |groups|, not |rows|).  Measured 32 -> 8 at sf0.1: the LEFT
    OUTER interval join drops ~30% wall from state-commit overhead
    alone.  Restored after the query finishes (the value is only read
    at stream start).
    """
    conf = spark.conf
    target = conf.get("spark.html2text.stream.statePartitions", "8")
    prev = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.shuffle.partitions", target)
    try:
        yield
    finally:
        conf.set("spark.sql.shuffle.partitions", prev)


def run_finite_stream(
    spark,
    staged: DataFrame,
    stream_fn: Callable[[DataFrame], DataFrame],
    query_name: str,
    work_dir: Optional[str] = None,
    output_mode: str = "append",
) -> DataFrame:
    """Write ``staged`` as one file, apply ``stream_fn`` to a readStream
    of it, drain with availableNow into memory sink ``query_name`` and
    return the resulting table."""
    cleanup = work_dir is None
    if work_dir is None:
        work_dir = tempfile.mkdtemp(prefix="h2t_stream_")
    try:
        in_dir = os.path.join(work_dir, "in")
        staged.coalesce(1).write.mode("overwrite").parquet(in_dir)
        stream = spark.readStream.schema(
            spark.read.parquet(in_dir).schema
        ).parquet(in_dir)
        with _state_partitions(spark):
            q = (
                stream_fn(stream)
                .writeStream.format("memory")
                .queryName(query_name)
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        if cleanup:
            # the memory sink holds the rows; the staged input is
            # disposable -- removed even when the query fails, so
            # repeated failing runs can't accumulate corpus copies
            shutil.rmtree(work_dir, ignore_errors=True)
    return spark.table(query_name)


def run_finite_stream2(
    spark,
    staged_a: DataFrame,
    staged_b: DataFrame,
    stream_fn: Callable[[DataFrame, DataFrame], DataFrame],
    query_name: str,
    work_dir: Optional[str] = None,
    output_mode: str = "append",
) -> DataFrame:
    """Two-input variant for stream-stream operators (joins): each side
    is staged as ONE parquet file so the first micro-batch admits BOTH
    sides' rows atomically -- no row can be declared late by a watermark
    that a prior batch already advanced (same invariant as the
    single-input harness, applied per side)."""
    cleanup = work_dir is None
    if work_dir is None:
        work_dir = tempfile.mkdtemp(prefix="h2t_stream2_")
    try:
        streams = []
        for name, staged in (("a", staged_a), ("b", staged_b)):
            in_dir = os.path.join(work_dir, name)
            staged.coalesce(1).write.mode("overwrite").parquet(in_dir)
            streams.append(
                spark.readStream.schema(
                    spark.read.parquet(in_dir).schema
                ).parquet(in_dir)
            )
        with _state_partitions(spark):
            q = (
                stream_fn(*streams)
                .writeStream.format("memory")
                .queryName(query_name)
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        if cleanup:
            shutil.rmtree(work_dir, ignore_errors=True)
    return spark.table(query_name)
