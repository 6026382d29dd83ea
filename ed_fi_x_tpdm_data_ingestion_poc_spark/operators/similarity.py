"""Similarity search over embedding columns: brute-force cosine top-k
(exact baseline) and hyperplane-LSH bucketed top-k (the scale path).

Scale design: brute force is O(Q x N) dot products — fine when the query
set is small and broadcast; the LSH variant buckets vectors by sign
patterns against fixed random hyperplanes so each query only scores its
bucket's candidates (multi-table to recover recall). Dot products are
JVM-side (zip_with + aggregate) — no Python, no UDF, vectorizable by
codegen; at 100 TB the N side stays partitioned and only the compact
(id, bucket) index shuffles.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _normalized(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return emb.select(
        F.col(id_col).alias("id"), F.transform(v, lambda x: x / norm).alias("nv")
    )


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    queries has the same (id_col, vec_col) shape; the query side is
    broadcast so the corpus never shuffles. Rank is computed on the ROUNDED
    cosine (6 dp) with id tie-break, making the result engine-deterministic.
    """
    corpus = _normalized(emb, id_col, vec_col)
    qs = _normalized(queries, id_col, vec_col).select(
        F.col("id").alias("qid"), F.col("nv").alias("qv")
    )
    scored = (
        corpus.join(F.broadcast(qs), F.col("id") != F.col("qid"))
        .select(
            "qid",
            F.col("id").alias("nid"),
            F.round(_dot(F.col("qv"), F.col("nv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "cosine", "rank")
    )


def hyperplane_planes(dim: int, tables: int, bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes, shape (tables, bits, dim)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((tables, bits, dim))


def hyperplane_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    tables: int = 8,
    bits: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via sign-random-projection LSH.

    Each vector gets `tables` bucket keys (one per hash table); a query
    scores only vectors sharing a bucket in any table. Candidates are exact-
    scored and re-ranked, so precision is exact and only recall is
    approximate (more tables/fewer bits => higher recall, more candidates).

    Bucket keys are sign patterns of X @ planes, computed per Arrow batch in
    numpy (tables*bits interpreted per-row dot products measured ~10x
    slower); sign is scale-invariant so raw vectors need no normalization.
    """
    planes = hyperplane_planes(dim, tables, bits, seed)

    def bucket_df(df: DataFrame) -> DataFrame:
        p = planes.reshape(tables * bits, dim)

        def key_batches(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                x = np.asarray([np.asarray(v, dtype="float64") for v in pdf["v"]])
                signs = (x @ p.T) > 0  # (n, tables*bits)
                out_ids, out_keys = [], []
                for t in range(tables):
                    key = np.full(len(pdf), t << bits, dtype="int64")
                    for b in range(bits):
                        key += signs[:, t * bits + b].astype("int64") << b
                    out_ids.append(pdf["id"].to_numpy())
                    out_keys.append(key)
                yield pd.DataFrame(
                    {"id": np.concatenate(out_ids), "bk": np.concatenate(out_keys)}
                )

        keys = df.select(
            F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v")
        ).mapInPandas(key_batches, "id long, bk long")
        return keys

    corpus = _normalized(emb, id_col, vec_col).join(bucket_df(emb), "id")
    qs = (
        _normalized(queries, id_col, vec_col)
        .join(bucket_df(queries), "id")
        .select(F.col("id").alias("qid"), F.col("nv").alias("qv"), "bk")
    )
    cands = (
        corpus.join(F.broadcast(qs), on="bk")
        .filter(F.col("id") != F.col("qid"))
        .select("qid", F.col("id").alias("nid"), "qv", "nv")
        .dropDuplicates(["qid", "nid"])
    )
    scored = cands.select(
        "qid", "nid", F.round(_dot(F.col("qv"), F.col("nv")), 6).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "cosine", "rank")
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 6,
    n_assign: int = 2,
    kmeans_iters: int = 5,
    train_sample: int = 4096,
    seed: int = 7,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    n_centroids cells via a spherical-k-means codebook (trained on a
    driver-side sample), search only the n_probe cells nearest each query,
    exact-score the candidates.

    Two recall dials beyond probe count: the codebook is REFINED with
    `kmeans_iters` Lloyd steps (random corpus anchors quantize badly —
    measured recall@10 0.54 vs 0.95+ trained), and each corpus vector is
    soft-assigned to its `n_assign` nearest cells (index grows n_assign x,
    boundary neighbors stop falling through cell walls). Precision is
    exact — candidates are rescored with true cosine. Compared to
    hyperplane LSH the codebook adapts to the data distribution; the cost
    is training and a re-buildable index, the standard IVF trade.
    """
    import numpy as np

    spark = emb.sparkSession
    sample_pdf = (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.pmod(F.xxhash64(F.col("id") + seed), 9973), "id")
        .limit(train_sample)
        .toPandas()
    )
    x = np.asarray([np.asarray(v, dtype="float64") for v in sample_pdf["v"]])
    x = x / np.sqrt((x * x).sum(axis=1, keepdims=True))
    c = x[:n_centroids].copy()  # deterministic init from the shuffled sample
    for _ in range(kmeans_iters):  # spherical k-means on the sample
        assign_idx = np.argmax(x @ c.T, axis=1)
        for j in range(n_centroids):
            members = x[assign_idx == j]
            if len(members):
                m = members.sum(axis=0)
                c[j] = m / np.linalg.norm(m)
    bc = spark.sparkContext.broadcast(c)

    def assign(df: DataFrame, probes: int) -> DataFrame:
        def batches(it):
            import numpy as np
            import pandas as pd

            cm = bc.value
            for pdf in it:
                x = np.asarray([np.asarray(v, dtype="float64") for v in pdf["v"]])
                x = x / np.sqrt((x * x).sum(axis=1, keepdims=True))
                sims = x @ cm.T  # (n, n_centroids)
                top = np.argsort(-sims, axis=1)[:, :probes]
                ids = np.repeat(pdf["id"].to_numpy(), probes)
                yield pd.DataFrame({"id": ids, "cell": top.ravel()})

        return df.select(
            F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v")
        ).mapInPandas(batches, "id long, cell int")

    corpus = _normalized(emb, id_col, vec_col).join(assign(emb, n_assign), "id")
    qs = (
        _normalized(queries, id_col, vec_col)
        .join(assign(queries, n_probe), "id")
        .select(F.col("id").alias("qid"), F.col("nv").alias("qv"), "cell")
    )
    cands = (
        corpus.join(F.broadcast(qs), on="cell")
        .filter(F.col("id") != F.col("qid"))
        .select("qid", F.col("id").alias("nid"), "qv", "nv")
        .dropDuplicates(["qid", "nid"])
    )
    scored = cands.select(
        "qid", "nid", F.round(_dot(F.col("qv"), F.col("nv")), 6).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "cosine", "rank")
    )


def recall_at_k(approx: DataFrame, exact: DataFrame) -> float:
    """|approx ∩ exact| / |exact| over (qid, nid) pairs."""
    hits = approx.select("qid", "nid").intersect(exact.select("qid", "nid")).count()
    total = exact.count()
    return hits / total if total else 1.0
