"""Operator-family tests: dedup, similarity, text stats, multimodal,
streaming, and the driver contract (__spark_entry__)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_exact_dedup_finds_planted_duplicates(spark, docs):
    from html2text_spark.operators.dedup import exact_dedup

    base = docs.select("doc_id", "text").limit(20)
    copy = base.select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    out = exact_dedup(base.unionAll(copy)).collect()
    assert len(out) == 40
    assert all(r["dup_count"] == 2 for r in out)
    canon = [r for r in out if r["is_canonical"]]
    assert len(canon) == 20 and all(r["doc_id"] < 10000 for r in canon)


def test_minhash_lsh_finds_near_duplicates(spark, docs):
    from html2text_spark.operators.dedup import minhash_lsh_candidates

    base = docs.select("doc_id", "text").limit(50)
    near = base.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"),
    )
    pairs = minhash_lsh_candidates(base.unionAll(near)).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    planted = {(i, i + 10000) for i in range(50)}
    recall = len(found & planted) / len(planted)
    assert recall > 0.8, f"LSH recall too low: {recall}"


def test_simhash_near_dups(spark, docs):
    from html2text_spark.operators.dedup import simhash_near_dups

    base = docs.select("doc_id", "text").limit(30)
    # exact copies have hamming distance 0
    copy = base.select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    pairs = simhash_near_dups(base.unionAll(copy), max_hamming=3).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs if r["hamming"] == 0}
    planted = {(i, i + 10000) for i in range(30)}
    assert planted <= found


def test_ngram_jaccard_identical_docs(spark, docs):
    from html2text_spark.operators.dedup import ngram_jaccard_pairs

    base = docs.select("doc_id", F.lit("g").alias("grp"), "text").limit(5)
    copy = base.select(
        (F.col("doc_id") + 10000).alias("doc_id"), "grp", "text"
    )
    pairs = ngram_jaccard_pairs(
        base.unionAll(copy), group_col="grp", threshold=0.99
    ).collect()
    exact = {(r["doc_a"], r["doc_b"]) for r in pairs if r["jaccard"] == 1.0}
    assert {(i, i + 10000) for i in range(5)} <= exact


def test_lsh_topk_recall_vs_brute_force(spark, emb):
    from html2text_spark.operators.similarity import cosine_topk, lsh_topk

    qids = [0, 1, 2, 3, 4, 5, 6, 7]
    exact = cosine_topk(emb, qids, k=10).collect()
    approx = lsh_topk(emb, qids, k=10, n_planes=4).collect()
    exact_set = {(r["qid"], r["vec_id"]) for r in exact}
    approx_set = {(r["qid"], r["vec_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 4 planes -> 16 buckets over 500 vectors: recall is partial by design
    assert recall > 0.2, f"LSH recall suspiciously low: {recall}"
    # every approx hit must carry the same sim the exact path computed
    exact_sims = {(r["qid"], r["vec_id"]): r["sim"] for r in exact}
    for r in approx:
        key = (r["qid"], r["vec_id"])
        if key in exact_sims:
            assert abs(r["sim"] - exact_sims[key]) < 1e-12


def test_lang_id_schema_and_determinism(spark, docs):
    from html2text_spark.operators.textstats import lang_id

    out = lang_id(docs.limit(50))
    rows = out.collect()
    assert set(out.columns) == {
        "doc_id", "score_de", "score_en", "score_es", "score_fr", "score_zh",
        "predicted_lang",
    }
    assert all(
        r["predicted_lang"] in ("de", "en", "es", "fr", "zh", "und") for r in rows
    )


def test_multimodal_stub_and_features(spark, docs):
    from html2text_spark.operators.multimodal import (
        attach_fake_media,
        decode_image,
        extract_media_features,
        frame_sample_plan,
    )

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")

    media = attach_fake_media(docs.limit(10))
    feats = extract_media_features(media).collect()
    assert len(feats) == 10
    for r in feats:
        assert len(r["features"]) == 8
        assert all(0.0 <= x < 1.0 for x in r["features"])
        assert r["n_bytes"] > 0
    # deterministic: same input -> same features
    feats2 = extract_media_features(media).collect()
    assert {r["doc_id"]: r["sha256_prefix"] for r in feats} == {
        r["doc_id"]: r["sha256_prefix"] for r in feats2
    }
    plan = frame_sample_plan(
        media.withColumn(
            "meta",
            F.struct(
                F.lit("video/fake").alias("mime"),
                F.lit(0).alias("width"),
                F.lit(0).alias("height"),
                F.lit(3500).alias("duration_ms"),
            ),
        ),
        every_ms=1000,
    )
    assert plan.filter(F.col("doc_id") == plan.first()["doc_id"]).count() == 4


def test_streaming_extract(spark, tmp_path, docs):
    from html2text_spark.sources import adapt_flat_documents
    from html2text_spark.streaming import streaming_extract

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    adapt_flat_documents(docs.limit(25)).write.parquet(in_dir)
    q = streaming_extract(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    result = spark.read.parquet(out_dir)
    assert result.count() == 25
    assert set(result.columns) == {"doc_id", "spans", "metrics"}
    # re-running with same checkpoint is exactly-once: no new rows
    q2 = streaming_extract(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == 25


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(e.queries()) >= set(e.oracle_sql())


def test_queries_run_at_sf0001(spark):
    import __spark_entry__ as e

    for name, fn in e.queries().items():
        df = fn(spark, SF)
        assert df.limit(1).count() >= 0, name


def test_sessionize_batch_vs_oracle_shape(spark):
    """Batch sessionization on the events table; sanity on session math."""
    from html2text_spark.streaming.sessions import sessionize_batch

    events = spark.read.parquet(f"{SF}/events.parquet")
    sessions = sessionize_batch(events, gap_minutes=30)
    rows = sessions.collect()
    assert sum(r["events"] for r in rows) == events.count()
    assert all(r["session_start"] <= r["session_end"] for r in rows)
    # per-user session count is deterministic
    again = sessionize_batch(events, gap_minutes=30).collect()
    assert len(again) == len(rows)


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Streaming sessionization (applyInPandasWithState) must emit the
    same closed sessions the batch window computation derives."""
    from html2text_spark.streaming.sessions import (
        sessionize_batch,
        sessionize_stream,
    )

    events = spark.read.parquet(f"{SF}/events.parquet").filter(
        F.col("user_id") < 20
    )
    in_dir = str(tmp_path / "in")
    events.write.parquet(in_dir)
    stream = spark.readStream.schema(events.schema).parquet(in_dir)
    # state-store init cost scales with shuffle partitions: shrink for test
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            sessionize_stream(stream, gap_minutes=30)
            .writeStream.format("memory")
            .queryName("sessions_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # the stateful query may not self-terminate while group-state
        # timeouts are pending; wait for the drain then stop explicitly
        import time as _time

        deadline = _time.time() + 120
        while _time.time() < deadline:
            if q.awaitTermination(5):
                break
            progress = q.lastProgress
            if progress and progress["numInputRows"] == 0:
                break
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    got = {
        (r["user_id"], r["session_start"], r["events"])
        for r in spark.sql("select * from sessions_out").collect()
    }
    expected = {
        (r["user_id"], r["session_start"], r["events"])
        for r in sessionize_batch(events, gap_minutes=30).collect()
    }
    # the stream emits closed sessions; with availableNow the final open
    # session per user stays in state, so the emitted set is a subset
    # that must exactly match batch sessions minus each user's last one
    assert got <= expected
    missing = expected - got
    by_user = {}
    for u, s, n in expected:
        by_user.setdefault(u, []).append((s, n))
    last_sessions = {
        (u, max(v)[0], dict(v)[max(v)[0]]) for u, v in by_user.items()
    }
    assert missing <= last_sessions


def test_ivf_topk_recall_vs_brute_force(spark, emb):
    from html2text_spark.operators.similarity import cosine_topk, ivf_topk

    qids = [0, 1, 2, 3, 4, 5, 6, 7]
    exact = cosine_topk(emb, qids, k=10).collect()
    approx = ivf_topk(emb, qids, k=10, n_cells=16, n_probe=4).collect()
    exact_set = {(r["qid"], r["vec_id"]) for r in exact}
    approx_set = {(r["qid"], r["vec_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall > 0.5, f"IVF recall too low: {recall}"
    # sims must agree exactly with the brute-force computation
    exact_sims = {(r["qid"], r["vec_id"]): r["sim"] for r in exact}
    for r in approx:
        key = (r["qid"], r["vec_id"])
        if key in exact_sims:
            assert r["sim"] == exact_sims[key]
    # determinism: second run identical
    again = {(r["qid"], r["vec_id"], r["rank"]) for r in
             ivf_topk(emb, qids, k=10, n_cells=16, n_probe=4).collect()}
    assert again == {(r["qid"], r["vec_id"], r["rank"]) for r in approx}
