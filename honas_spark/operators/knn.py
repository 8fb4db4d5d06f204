"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — exact baseline.  The dot product runs
    JVM-side via zip_with/aggregate (whole-stage codegen); the query side
    is broadcast so the big side never shuffles.
  * IVF (inverted-file) top-k — the 100 TB path: vectors are bucketed to
    their nearest of C centroids once (vectorized numpy inside a pandas
    UDF — one Arrow pass), queries probe only the closest `nprobe`
    buckets, so the per-query work drops from O(N) to O(N * nprobe / C).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import IntegerType


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_sim(a, b):
    """Cosine similarity of two array<float/double> columns — built-ins
    only (zip_with + aggregate), runs inside codegen."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    vector table; rank with a per-query window.  Ties break on neighbor
    id for determinism.  Output: (query_id, neighbor_id, rank)."""
    joined = vectors.crossJoin(F.broadcast(queries)).withColumn(
        "sim", cosine_sim(F.col(vec_col), F.col(query_vec_col))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("sim"), F.col(id_col)
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.col("rank"),
            F.col("sim"),
        )
    )


def _assign_udf(centroids: np.ndarray):
    """Vectorized nearest-centroid assignment (one matmul per Arrow
    batch); centroids are L2-normalized driver-side and broadcast in the
    closure."""
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf(IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ cn.T, axis=1).astype(np.int32))

    return assign


def kmeans_refine(
    vectors: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    n_iters: int = 3,
) -> np.ndarray:
    """Distributed Lloyd iterations over the (optionally pre-sampled)
    vector table: assignment is one matmul per Arrow batch; the new
    means come from ONE shuffle of (bucket, dim) partial sums per
    iteration (map-side combined), so per-iter driver traffic is
    O(C x D) regardless of N.  Deterministic: ties in argmax break to
    the lowest bucket.  Empty buckets keep their previous centroid."""
    C, D = centroids.shape
    for _ in range(n_iters):
        assigned = vectors.withColumn(
            "bucket", _assign_udf(centroids)(F.col(vec_col))
        )
        rows = (
            assigned.select(
                "bucket", F.posexplode(F.col(vec_col)).alias("pos", "val")
            )
            .groupBy("bucket", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        sums = np.zeros((C, D), dtype=np.float64)
        counts = np.zeros(C, dtype=np.int64)
        for r in rows:
            sums[r["bucket"], r["pos"]] = r["s"]
            counts[r["bucket"]] = r["n"]
        new = centroids.copy()
        nonempty = counts > 0
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        centroids = new
    return centroids


def ivf_index(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_stride: Optional[int] = None,
    kmeans_iters: int = 0,
    train_sample_pct: Optional[int] = None,
) -> tuple[DataFrame, np.ndarray]:
    """Bucket every vector to its nearest centroid.

    Centroid init is a deterministic stratified sample of the data
    (stride over ids); `kmeans_iters > 0` refines them with distributed
    Lloyd iterations (kmeans_refine) — at corpus scale pass
    `train_sample_pct` to train on a deterministic hash sample while
    still assigning the FULL table.  Returns (bucketed df, centroids)."""
    total = vectors.count()
    stride = sample_stride or max(total // n_centroids, 1)
    cents = (
        vectors.filter((F.col(id_col) % stride) == 0)
        .orderBy(id_col)
        .limit(n_centroids)
        .select(vec_col)
        .collect()
    )
    centroids = np.array([r[0] for r in cents], dtype=np.float64)
    if kmeans_iters > 0:
        train = vectors
        if train_sample_pct is not None:
            from .sampling import hash_sample

            train = hash_sample(
                vectors.withColumn("_sk", F.col(id_col).cast("string")),
                "_sk",
                train_sample_pct,
            )
        centroids = kmeans_refine(train, centroids, vec_col, kmeans_iters)
    bucketed = vectors.withColumn(
        "bucket", _assign_udf(centroids)(F.col(vec_col))
    )
    return bucketed, centroids


def ivf_topk(
    bucketed: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """ANN top-k probing only the nprobe nearest buckets per query.
    Output: (query_id, neighbor_id, rank, sim)."""
    spark = bucketed.sparkSession
    qrows = queries.collect()
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    probe_rows = []
    for r in qrows:
        qv = np.asarray(r[query_vec_col], dtype=np.float64)
        qv = qv / max(np.linalg.norm(qv), 1e-12)
        order = np.argsort(-(cn @ qv))[:nprobe]
        for b in order:
            probe_rows.append((r[query_id_col], int(b), list(r[query_vec_col])))
    probes = spark.createDataFrame(
        probe_rows, f"{query_id_col} long, bucket int, {query_vec_col} array<double>"
    )
    joined = bucketed.join(F.broadcast(probes), "bucket").withColumn(
        "sim", cosine_sim(F.col(vec_col), F.col(query_vec_col))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("sim"), F.col(id_col)
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(query_id_col),
            F.col(id_col).alias("neighbor_id"),
            F.col("rank"),
            F.col("sim"),
        )
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    min_sim: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: bucket by IVF centroid,
    compare only within buckets (plus nothing across — recall/cost
    trade-off documented), keep pairs with cosine >= min_sim."""
    bucketed, _ = ivf_index(vectors, id_col, vec_col, n_centroids)
    a = bucketed.select(
        F.col("bucket"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
    )
    b = bucketed.select(
        F.col("bucket"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", cosine_sim(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= min_sim)
        .select("id_a", "id_b", "sim")
    )


def srp_planes(bits: int, dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic integer random-hyperplane matrix for SRP-LSH:
    standard normals from a seeded RNG, scaled and rounded to integers
    in roughly [-300, 300] so every engine computes the same dot-product
    SIGN in exact arithmetic (no float-summation-order ambiguity)."""
    rng = np.random.default_rng(seed)
    return np.round(rng.standard_normal((bits, dim)) * 100).astype(
        np.int64
    )


def srp_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 16,
    dim: "int | None" = None,
    seed: int = 42,
    scale: int = 1000,
) -> DataFrame:
    """Signed-random-projection (SRP / random-hyperplane) LSH signature
    for COSINE similarity (Charikar 2002's simhash-for-vectors): bit p
    = sign(<v, plane_p>); the expected Hamming distance between two
    signatures is bits * angle/pi, so banding the signature (reuse
    simhash_near_pairs) finds angular near-neighbors without any
    vector ever shuffling — the scale path that complements the IVF
    bucketing in embedding_near_dup_pairs.

    QUANTIZED on purpose: the vector is rounded to integers
    (round(x * scale)) and the planes are integer-valued
    (`srp_planes`), so the dot product is exact integer math and a SQL
    oracle recomputes the identical signature — no cross-engine
    float-summation-order hazard.  Quantization can only flip bits for
    vectors nearly orthogonal to a plane (|<v,p>| < dim/scale-ish),
    which perturbs Hamming distances by at most those boundary bits.

    Output: (id, srp long) — one codegen projection, zero shuffle."""
    if not 1 <= bits <= 64:
        # plane 63 maps to the two's-complement sign bit; more planes
        # would alias onto it (and their sum overflows under ANSI mode)
        raise ValueError(f"bits must be in [1, 64]: {bits}")
    if dim is None:
        row = df.select(F.size(F.col(vec_col))).first()
        if row is None:
            raise ValueError(
                "cannot infer dim from an empty DataFrame; pass dim="
            )
        dim = row[0]
    planes = srp_planes(bits, dim, seed)
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x * scale).cast("long"),
    )
    base = df.select(F.col(id_col), q.alias("_q"))
    terms = []
    for p in range(bits):
        plane = F.array(*[F.lit(int(w)) for w in planes[p]])
        dot = F.aggregate(
            F.zip_with(F.col("_q"), plane, lambda x, w: x * w),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        )
        val = (1 << p) if p < 63 else -(1 << 63)
        terms.append(
            F.when(dot > 0, F.lit(val).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    sig = terms[0]
    for t in terms[1:]:
        sig = sig + t
    return base.select(F.col(id_col), sig.alias("srp"))
