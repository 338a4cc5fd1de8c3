"""Similarity search over an embedding column (array<float>).

  * cosine_topk     exact brute force: broadcast the (small) query side
                    against the corpus, window top-k.  The baseline and
                    the verification oracle.  All arithmetic in double
                    with a left-fold sum so the DuckDB oracle reproduces
                    results bit-for-bit.
  * lsh_topk        random-hyperplane LSH: bucket the corpus by sign
                    signature, probe only matching buckets.  The scale
                    path: corpus side shuffles once on bucket key; query
                    side is broadcast.  Approximate -- tests measure
                    recall against cosine_topk.
"""

from __future__ import annotations

import hashlib
import math
from typing import List, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def _cosine(a: Column, b: Column) -> Column:
    """Cosine similarity rounded to 8dp (the oracle-mirrored form).

    Reference definition only: the operators precompute ``_norm`` per
    ROW and divide by the product inside the pair loop (identical IEEE
    op order, bit-equal results) instead of re-evaluating both norm
    folds per candidate pair.
    """
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 8)


def cosine_topk(
    emb: DataFrame,
    query_ids: Sequence[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (self excluded).

    Plan: corpus scan -> broadcast-join the tiny query side -> projection
    (codegen'd fold for dot/norm) -> window top-k partitioned by query.
    The only shuffle is the window's hash partition on qid (|queries|
    keys) over |queries| x |corpus| similarity rows; at 10^12-doc scale
    swap the window for a per-partition heap aggregation, same API.
    """
    # norms precomputed ONCE per row (the r5 shape re-evaluated both
    # array folds inside every (query, corpus) pair -- guide §2.3's
    # "don't recompute in the hot pair loop"); sqrt-then-multiply is the
    # identical IEEE operation order, so sims hash bit-equal
    corpus = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("e"),
    ).withColumn("nrm", _norm(F.col("e")))
    queries = corpus.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )
    joined = F.broadcast(queries).crossJoin(corpus).filter(
        F.col("vec_id") != F.col("qid")
    )
    sim = F.round(
        _dot(F.col("qe"), F.col("e")) / (F.col("qnrm") * F.col("nrm")), 8
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        joined.select("qid", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> List[List[float]]:
    """Deterministic pseudo-random unit hyperplanes (md5-driven, no RNG
    state -- identical on every executor and every run)."""
    planes = []
    for p in range(n_planes):
        vec = []
        for d in range(dim):
            digest = hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()
            u = int.from_bytes(digest[:8], "big") / 2**64  # [0,1)
            v = int.from_bytes(digest[8:], "big") / 2**64
            # Box-Muller for a gaussian component
            vec.append(
                math.sqrt(-2.0 * math.log(u + 1e-12)) * math.cos(2 * math.pi * v)
            )
        planes.append(vec)
    return planes


def lsh_bucket(vec_col: Column, planes: List[List[float]]) -> Column:
    """Sign-signature bucket id from the hyperplane table (built-ins only:
    the plane table is a literal array, folded JVM-side)."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        d = _dot(vec_col, lit_plane)
        bucket = bucket + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (doc_a < doc_b, sim >= t).

    Scale path: both sides hashed to LSH sign buckets (one projection),
    candidates = pairs sharing a bucket (equi-join on the bucket key, one
    uniform shuffle), exact cosine verified on candidates only.  Two
    vectors with cosine >= 0.9 agree on each hyperplane with high
    probability, so recall is high for true near-dups while the join
    touches ~1/2^n_planes of all pairs.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    # norm precomputed per row: inside the bucket self-join it would be
    # re-evaluated once per candidate PAIR (two extra 64-element folds
    # per pair); sqrt-then-multiply keeps the identical IEEE op order
    hashed = (
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("e"),
        )
        .withColumn("bucket", lsh_bucket(F.col("e"), planes))
        .withColumn("nrm", _norm(F.col("e")))
    )
    l, r = hashed.alias("l"), hashed.alias("r")
    sim = F.round(
        _dot(F.col("l.e"), F.col("r.e")) / (F.col("l.nrm") * F.col("r.nrm")),
        8,
    )
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("doc_a"),
            F.col("r.vec_id").alias("doc_b"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def _ivf_core(
    corpus: DataFrame,
    query_ids: Sequence[int],
    k: int,
    n_probe: int,
    centroids: List[List[float]],
) -> DataFrame:
    """Shared IVF search: assign cells, probe, exact-cosine re-rank.

    At corpus scale the cell assignment is a one-off projection (write
    ``cell`` as a partition column) and a query touches only
    n_probe/n_cells of the data; here the index is built inline.
    """

    def _nearest_cells(vec_column: Column, n: int) -> Column:
        """Array of the n nearest centroid ids (squared-L2, built-ins)."""
        dists = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            vec_column,
                            F.array(*[F.lit(x) for x in c]),
                            lambda a, b: (a - b) * (a - b),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("dist"),
                    F.lit(i).alias("cell"),
                )
                for i, c in enumerate(centroids)
            ]
        )
        return F.slice(
            F.transform(F.array_sort(dists), lambda s: s["cell"]), 1, n
        )

    # norm precomputed per row (re-evaluated per candidate pair in the
    # r5 shape); identical IEEE op order, sims hash bit-equal
    indexed = corpus.withColumn(
        "cell", F.element_at(_nearest_cells(F.col("e"), 1), 1)
    ).withColumn("nrm", _norm(F.col("e")))
    queries = indexed.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qnrm"),
        F.explode(_nearest_cells(F.col("e"), n_probe)).alias("probe_cell"),
    )
    joined = F.broadcast(queries).join(
        indexed,
        (F.col("cell") == F.col("probe_cell")) & (F.col("vec_id") != F.col("qid")),
    )
    sim = F.round(
        _dot(F.col("qe"), F.col("e")) / (F.col("qnrm") * F.col("nrm")), 8
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        joined.select("qid", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: Sequence[int],
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index, trained cells.

    Train-once k-means centroids partition the corpus into ``n_cells``
    cells; each query probes its ``n_probe`` nearest cells and re-ranks
    candidates with exact cosine.

    Deterministic run-to-run (KMeans seeded; centroid order stable for a
    fixed input) but not SQL-mirrorable -- verified by recall tests; use
    ``ivf_det_topk`` for the oracle-exact variant.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("e"),
    )
    featurized = corpus.withColumn("features", array_to_vector("e"))
    model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(featurized)
    centroids = [[float(x) for x in c] for c in model.clusterCenters()]
    return _ivf_core(corpus, query_ids, k, n_probe, centroids)


def det_centroids(
    dim: int, n_cells: int, seed: int = 11, scale: float = 0.5
) -> List[List[float]]:
    """Deterministic pseudo-random centroids (md5-driven like
    ``_hyperplanes``): identical on every executor, every run, and
    mirrorable as SQL literals in the DuckDB oracle.  Quality is below
    trained k-means (cells are not data-adapted) -- this is the
    verification twin, ``ivf_topk`` is the quality path."""
    return [
        [x * scale for x in plane]
        for plane in _hyperplanes(dim, n_cells, seed=seed)
    ]


def ivf_det_topk(
    emb: DataFrame,
    query_ids: Sequence[int],
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> DataFrame:
    """IVF top-k with deterministic md5-derived centroids: exact-oracle
    variant of ``ivf_topk`` (same probe/re-rank plan, fixed cells)."""
    corpus = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("e"),
    )
    centroids = det_centroids(dim, n_cells, seed=seed)
    return _ivf_core(corpus, query_ids, k, n_probe, centroids)


def lsh_topk(
    emb: DataFrame,
    query_ids: Sequence[int],
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    probe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: multi-probe sign-signature LSH.

    2^n_planes buckets; corpus hashed once (projection).  The tiny query
    side is *expanded* to all buckets within hamming distance
    ``probe_bits`` of its own signature (1 + n_planes probes for
    probe_bits=1), so the candidate lookup stays a broadcast equi-join on
    the bucket key -- no cross join, no skew -- while recall rises with
    the probe count.  Exact cosine re-ranks inside the candidate set.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    # per-row norm precomputed (not re-evaluated per candidate pair);
    # identical IEEE op order, sims hash bit-equal
    corpus = (
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("e"),
        )
        .withColumn("bucket", lsh_bucket(F.col("e"), planes))
        .withColumn("nrm", _norm(F.col("e")))
    )
    queries = corpus.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qnrm"),
        F.col("bucket").alias("qbucket"),
    )
    probes = [F.col("qbucket")]
    if probe_bits >= 1:
        probes += [
            F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)
        ]
    if probe_bits >= 2:
        probes += [
            F.col("qbucket").bitwiseXOR(F.lit((1 << i) | (1 << j)))
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    queries = queries.withColumn(
        "probe", F.explode(F.array(*probes))
    )
    joined = F.broadcast(queries).join(
        corpus,
        (F.col("bucket") == F.col("probe")) & (F.col("vec_id") != F.col("qid")),
    )
    sim = F.round(
        _dot(F.col("qe"), F.col("e")) / (F.col("qnrm") * F.col("nrm")), 8
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        joined.select("qid", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def quantized_cosine_topk(
    emb: DataFrame,
    query_ids: Sequence[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors over INT8-quantized vectors.

    Symmetric scalar quantization (q_i = round(x_i / (amax/127))) cuts
    the vector footprint 4-8x -- the standard memory lever for
    billion-vector ANN.  Key identity: the per-vector scales cancel in
    the cosine, so similarity is computed ENTIRELY in integer dot
    products (sum q_a*q_b <= 127^2 * dims, int64-safe) -- deterministic
    at any parallelism and bit-reproducible in the SQL oracle, unlike
    any float-accumulation scheme.  Same broadcast-query/window-top-k
    plan as cosine_topk; recall vs the exact float cosine is asserted in
    tests (int8 typically preserves the top-k set on normalized-ish
    embeddings).
    """
    amax = F.aggregate(
        F.transform(F.col(vec_col).cast("array<double>"), lambda x: F.abs(x)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    scale = F.greatest(amax, F.lit(1e-12)) / F.lit(127.0)
    quant = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x / scale).cast("long"),
    )
    idot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # norms precomputed ONCE per row: inside the join they would be
    # re-evaluated per (query, corpus) pair -- 3 array folds per pair
    # where 1 suffices
    corpus = emb.select(
        F.col(id_col).alias("vec_id"), quant.alias("q")
    ).withColumn("nrm", F.sqrt(idot(F.col("q"), F.col("q")).cast("double")))
    queries = corpus.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("qid"),
        F.col("q").alias("qq"),
        F.col("nrm").alias("qnrm"),
    )
    joined = F.broadcast(queries).crossJoin(corpus).filter(
        F.col("vec_id") != F.col("qid")
    )
    sim = F.round(
        idot(F.col("qq"), F.col("q")).cast("double")
        / (F.col("qnrm") * F.col("nrm")),
        8,
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        joined.select("qid", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def quantized_centroids(
    emb: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group embedding centroid computed ENTIRELY in integer space.

    Float vector averaging is shuffle-order-dependent (double addition
    does not associate), so a naive per-dimension mean is not
    reproducible across runs, engines, or retries.  This operator
    int8-quantizes each vector with the same symmetric scheme as
    quantized_cosine_topk (scales are per-vector, quantized values are
    exact integers), sums per (group, dimension) as int64 -- EXACT and
    order-independent -- and divides once at the end (IEEE division,
    bit-reproducible).  The result is the centroid of the quantized
    vectors: the right anchor artifact for IVF cell seeding, drift
    monitoring, or class prototypes, where reproducibility matters more
    than the (bounded, ~1/254) quantization error.

    Plan: posexplode (JVM generator) -> one uniform (group, dim)
    aggregate, map-side combined.  int64 safety: |q| <= 127, so a group
    would need > 7e16 vectors to overflow.
    """
    amax = F.aggregate(
        F.transform(F.col(vec_col).cast("array<double>"), lambda x: F.abs(x)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    scale = F.greatest(amax, F.lit(1e-12)) / F.lit(127.0)
    quant = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x / scale).cast("long"),
    )
    exploded = emb.select(
        F.col(group_col).alias("grp"), F.posexplode(quant).alias("dim", "qv")
    )
    return exploded.groupBy("grp", "dim").agg(
        F.sum("qv").alias("sum_q"),
        F.count("*").alias("n_vecs"),
        F.round(
            F.sum("qv").cast("double") / F.count("*"), 6
        ).alias("centroid_q"),
    )
