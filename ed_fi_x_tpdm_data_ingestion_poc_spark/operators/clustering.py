"""Distributed Lloyd's k-means over an embedding column.

The scale contract differs from train_ivf_codebook (similarity.py:201),
which Lloyd-steps a bounded 4096-row DRIVER sample — right for seeding an
ANN index, wrong when the clustering itself is the product (domain
clustering for mixture balancing à la DoReMi, semantic sharding, topic
buckets): a sample misplaces small clusters and the assignment step still
has to touch every row anyway.

Here every iteration is ONE distributed pass shaped like a map-side
combine:

  * assignment + partial update fused in a single Arrow-batched
    mapInPandas: each batch emits k rows — (cluster, member count,
    per-dimension vector sum, inertia contribution). The corpus never
    shuffles; only batches×k tiny partial rows do.
  * the reduce is a k-row groupBy: counts/inertia sum natively, vector
    sums fold element-wise via aggregate(collect_list, zip_with) — all
    JVM expressions.
  * the driver sees exactly k rows per iteration (k·(d+2) doubles),
    recomputes centroids, and broadcasts them for the next pass. Empty
    clusters keep their previous centroid (deterministic, no re-seed
    randomness).

Initialization is deterministic without a corpus scan ordering
assumption: the k rows with the smallest xxhash64(id, seed) — a
TakeOrderedAndProject (per-partition top-k heaps, k-row driver merge),
the same primitive kmv_build uses.

No analog in the reference (its Java connector has no numeric compute);
brief-mandated LLM-pipeline surface.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _init_centroids(
    emb: DataFrame, id_col: str, vec_col: str, k: int, seed: int
) -> np.ndarray:
    rows = (
        emb.select(
            F.col(vec_col).alias("v"),
            F.xxhash64(F.col(id_col), F.lit(seed)).alias("h"),
        )
        .orderBy("h")
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"kmeans needs >= k={k} rows, got {len(rows)}")
    return np.asarray([np.asarray(r.v, dtype="float64") for r in rows])


def _farthest_candidates(sel: DataFrame, centroids: np.ndarray):
    """One row per Arrow batch: the batch's point farthest from the chosen
    centroid set (id, vector, min-distance). The driver reduces
    batches-many candidates, never the corpus."""
    bc = sel.sparkSession.sparkContext.broadcast(centroids)

    def gen(it):
        import numpy as np
        import pandas as pd

        c = bc.value
        c2 = (c * c).sum(axis=1)
        for pdf in it:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype="float64") for v in pdf["v"]]
            )
            d2 = (
                c2[None, :] - 2.0 * (x @ c.T)
                + (x * x).sum(axis=1)[:, None]
            )
            mind = d2.min(axis=1)
            i = int(np.argmax(mind))
            yield pd.DataFrame(
                {
                    "id": [pdf["id"].iloc[i]],
                    "v": [list(x[i])],
                    "d": [float(mind[i])],
                }
            )

    try:
        rows = sel.mapInPandas(
            gen, "id long, v array<double>, d double"
        ).collect()
    finally:
        # k-1 passes per init: release each pass's centroid copy even when
        # the pass fails — a leaked broadcast is exactly the long-session
        # accumulation this cleanup exists to prevent
        bc.destroy()
    return rows


def _init_farthest(
    emb: DataFrame, id_col: str, vec_col: str, k: int, seed: int
) -> np.ndarray:
    """Gonzalez farthest-point seeding: first seed by hash-min, each next
    seed the corpus point farthest from the chosen set (ties to the lower
    id — fully deterministic). k-1 extra map-only passes, each reducing
    to one candidate row per batch; the quality difference is structural,
    not marginal — hash-min seeding can drop two seeds in one true
    cluster and Lloyd cannot split the resulting empty cell, while
    farthest-point provably 2-approximates the k-center objective. For
    k in the thousands use fewer, heavier passes (k-means|| style
    oversampling); domain/mixture clustering runs at k <= a few hundred,
    where k-1 cheap passes win."""
    # fetch k hash-min rows even though only the first seeds the walk:
    # the same TakeOrdered validates n >= k without a separate count pass
    first = _init_centroids(emb, id_col, vec_col, k, seed)
    sel = emb.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v")
    )
    chosen = [first[0]]
    for _ in range(k - 1):
        cands = _farthest_candidates(sel, np.asarray(chosen))
        if not cands:
            raise ValueError(f"kmeans needs >= k={k} rows")
        best = max(cands, key=lambda r: (r.d, -r.id))
        chosen.append(np.asarray(best.v, dtype="float64"))
    return np.asarray(chosen)


def _partials(emb: DataFrame, centroids: np.ndarray, id_col: str, vec_col: str):
    """One fused assign+partial-update pass: k rows per Arrow batch.
    Returns (lazy DataFrame, broadcast handle) — the caller destroys the
    handle after its collect so iterate-many fits (one broadcast per
    Lloyd pass) don't accumulate centroid copies in long-lived
    sessions."""
    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast(centroids)
    k, d = centroids.shape

    def gen(it):
        import numpy as np
        import pandas as pd

        c = bc.value
        c2 = (c * c).sum(axis=1)
        for pdf in it:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype="float64") for v in pdf["v"]]
            )
            # argmin ||x-c||^2 = argmin (c.c - 2 x.c); full distances only
            # for the inertia rider
            d2 = c2[None, :] - 2.0 * (x @ c.T)
            a = np.argmin(d2, axis=1)
            best = d2[np.arange(len(x)), a] + (x * x).sum(axis=1)
            out = {"cluster": [], "cnt": [], "inertia": [], "sums": []}
            for j in range(len(c)):
                m = a == j
                n = int(m.sum())
                if not n:
                    continue
                out["cluster"].append(j)
                out["cnt"].append(n)
                out["inertia"].append(float(best[m].sum()))
                out["sums"].append(x[m].sum(axis=0).tolist())
            yield pd.DataFrame(out)

    df = emb.select(F.col(vec_col).alias("v")).mapInPandas(
        gen, "cluster int, cnt long, inertia double, sums array<double>"
    )
    return df, bc


def _reduce_partials(partials: DataFrame, d: int):
    """k-row JVM reduce: counts sum natively; inertia and vector sums fold
    over a SORTED collect_list so double summation order is fixed
    regardless of shuffle-fetch / task-completion order — the inertia
    values the prefix-determinism law compares with == are bit-identical
    across runs and cluster shapes, not merely close. Rows come back
    sorted by cluster id so driver-side folds are order-fixed too."""
    zero = F.array_repeat(F.lit(0.0), d)
    folded = F.aggregate(
        F.sort_array(F.collect_list(F.struct("inertia", "sums"))),
        F.struct(F.lit(0.0).alias("inertia"), zero.alias("sums")),
        lambda acc, x: F.struct(
            (acc["inertia"] + x["inertia"]).alias("inertia"),
            F.zip_with(
                acc["sums"], x["sums"], lambda a, b: a + b
            ).alias("sums"),
        ),
    )
    rows = (
        partials.groupBy("cluster")
        .agg(F.sum("cnt").alias("cnt"), folded.alias("agg"))
        .select(
            "cluster",
            "cnt",
            F.col("agg.inertia").alias("inertia"),
            F.col("agg.sums").alias("sums"),
        )
        .collect()
    )
    return sorted(rows, key=lambda r: r.cluster)


def kmeans_fit(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 5,
    seed: int = 11,
    init: str = "farthest",
    init_centroids: np.ndarray | None = None,
) -> dict:
    """Fit k centroids with `iters` full Lloyd passes. Returns
    {"centroids": (k,d) ndarray, "init": the (k,d) starting centroids,
    "inertia": per-iteration totals (non-increasing — a law the tests
    pin), "sizes": final member counts}. Deterministic: farthest-point
    init (default; "hash" for the cheap single-pass seeding), argmin
    ties break low. `init_centroids` skips seeding entirely (re-running
    Lloyd passes from a RECORDED init is how the prefix-determinism law
    avoids paying the k-1 farthest-point passes twice)."""
    if init_centroids is not None:
        c = np.asarray(init_centroids, dtype="float64").copy()
        if c.shape[0] != k:
            raise ValueError(
                f"init_centroids has {c.shape[0]} rows, expected k={k}"
            )
    elif init == "farthest":
        c = _init_farthest(emb, id_col, vec_col, k, seed)
    elif init == "hash":
        c = _init_centroids(emb, id_col, vec_col, k, seed)
    else:
        raise ValueError(f"unknown init {init!r} (farthest|hash)")
    init_c = c.copy()
    d = c.shape[1]
    inertia: list[float] = []
    sizes = [0] * k
    for _ in range(iters):
        pdf, bc = _partials(emb, c, id_col, vec_col)
        try:
            rows = _reduce_partials(pdf, d)
        finally:
            bc.destroy()
        inertia.append(sum(r.inertia for r in rows))
        nxt = c.copy()  # empty cluster keeps its previous centroid
        sizes = [0] * k
        for r in rows:
            nxt[r.cluster] = np.asarray(r.sums) / r.cnt
            sizes[r.cluster] = r.cnt
        c = nxt
    return {
        "centroids": c,
        "init": init_c,
        "inertia": inertia,
        "sizes": sizes,
        "k": k,
    }


def kmeans_inertia(
    emb: DataFrame,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Total squared distance to nearest centroid — one pass, k-row reduce."""
    pdf, bc = _partials(emb, centroids, id_col, vec_col)
    try:
        rows = _reduce_partials(pdf, centroids.shape[1])
    finally:
        bc.destroy()
    return sum(r.inertia for r in rows)


def kmeans_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, dist2) nearest-centroid assignment: map-only
    Arrow-batched pass with the (k,d) centroid matrix broadcast — the
    read path after a fit (shard routing, mixture accounting)."""
    bc = emb.sparkSession.sparkContext.broadcast(centroids)

    def gen(it):
        import numpy as np
        import pandas as pd

        c = bc.value
        c2 = (c * c).sum(axis=1)
        for pdf in it:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype="float64") for v in pdf["v"]]
            )
            d2 = c2[None, :] - 2.0 * (x @ c.T)
            a = np.argmin(d2, axis=1)
            best = d2[np.arange(len(x)), a] + (x * x).sum(axis=1)
            yield pd.DataFrame(
                {"id": pdf["id"], "cluster": a, "dist2": best}
            )

    return emb.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v")
    ).mapInPandas(gen, "id long, cluster int, dist2 double")
