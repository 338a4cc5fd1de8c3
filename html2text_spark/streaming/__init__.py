from .ingest import streaming_extract


def recommended_streaming_conf() -> dict:
    """Session settings for stateful streaming at scale.

    The default HDFS-backed state store keeps every key on the JVM heap
    -- at 10^9 session keys that is GC death.  RocksDB spills state to
    local disk with incremental checkpointing to the checkpoint
    location, bounding heap usage regardless of key cardinality.
    Verified compatible with the sessionizer in
    tests/test_operators.py::test_sessionize_stream_rocksdb_state_store.
    """
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
        # changelog checkpointing: upload only the delta per batch
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    }


__all__ = ["streaming_extract", "recommended_streaming_conf"]
