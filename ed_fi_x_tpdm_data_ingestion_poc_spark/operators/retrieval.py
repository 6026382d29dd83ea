"""Lexical retrieval: BM25 (Robertson & Sparck Jones / Okapi) over an
inverted index — the classic sparse scorer complementing the dense ANN
stack (operators/similarity.py) and the Jaccard baseline (q83).

Plan shape (the large-query-set answer q83's docstring promises): the
corpus becomes a POSTINGS table (term, id, tf, dl) built once; queries
join it ON THE TERM, so only postings for terms that actually occur in
some query are ever touched — no query × corpus product at any scale.
Document-frequency and corpus stats fold into the postings before the
join (one aggregate each); scoring is a JVM arithmetic projection and a
per-query top-k window.

Every quantity derives from integer counts (tf, df, dl, N), so DuckDB
recomputes identical doubles and declared queries hash-check VALUES
(ROUND absorbs the final libm/summation ulps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_postings(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, tf, dl): term frequencies + document length — the
    materialize-once inverted index (production writes it bucketed by
    term so query joins are zero-exchange on the corpus side)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    exploded = docs.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("dl"),
        F.explode(toks).alias("term"),
    )
    return exploded.groupBy("id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )


def bm25_topk(
    postings: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(qid, id, score, rank): top-k corpus docs per query under BM25
    with the standard smoothed idf = ln(1 + (N - df + 0.5)/(df + 0.5)).
    Scores ROUND to 6 dp BEFORE ranking so the rank order (score desc,
    id) is engine-exact. Queries contribute their DISTINCT terms —
    repeated query terms score once, the common BM25 convention."""
    from pyspark.sql.window import Window

    # N and avgdl from dl (one value per doc): aggregate distinct (id, dl)
    avg = (
        postings.select("id", "dl")
        .distinct()
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
        )
    )
    qterms = queries.select(
        F.col(id_col).alias("qid"),
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
            )
        ).alias("term"),
    )
    # Semi-join the postings down to QUERY terms before any per-term
    # work (round 17, guide §3.2 "reduce the big side before shuffling
    # it"): df(term) and the per-posting weight only matter for terms
    # some query contains, and the postings rows for one term are a
    # complete df sample regardless of the filter, so filtering first
    # is value-identical. Previously df_t aggregated ALL terms and the
    # model join re-shuffled the ENTIRE postings table per evaluation —
    # the plan's biggest two exchanges carried corpus-vocabulary rows
    # to score a handful of query terms. The query term list is
    # query-set-sized (broadcast), so the pruning join is map-side and
    # the surviving postings are tiny at any corpus scale. df then
    # comes from ONE count window over the term partition of the
    # PRUNED postings ((id, term) is unique by construction, so
    # count(*) == count_distinct(id)) instead of a separate aggregate
    # + join back — the df exchange and the model join disappear.
    # Measured (noop median-of-5, sf0.1): 1.55 s original; 1.92 s
    # aggregate+broadcast-df variant (each extra eager broadcast build
    # is a serialized job); 1.17 s this form. The broadcast goes
    # through the broadcast_if_small guard (ADVICE r17): a
    # corpus-scale query set with a wide vocabulary must fall back to
    # a shuffle semi-join instead of OOMing the driver on a mandatory
    # broadcast of query-derived data.
    from ..queries import broadcast_if_small

    q_term_set = broadcast_if_small(qterms.select("term").distinct())
    p_q = postings.join(q_term_set, "term")
    wt = Window.partitionBy("term")
    model = (
        p_q.withColumn("df", F.count(F.lit(1)).over(wt))
        .crossJoin(F.broadcast(avg))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .select("term", "id", "w")
    )
    scored = (
        qterms.join(model, "term")  # inverted index: only query terms touch
        .groupBy("qid", "id")
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), "id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def bm25_hard_negatives(
    postings: DataFrame,
    queries: DataFrame,
    qrels: DataFrame,
    *,
    k_pool: int = 10,
    k_neg: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(qid, id, score, rank): the top-k_neg HIGHEST-SCORING
    NON-RELEVANT documents per query — hard-negative mining for
    contrastive retriever training (the DPR/SBERT recipe: random
    negatives are too easy; BM25 near-misses carry the gradient).

    `qrels` is the (qid, id) relevance table. Plan: score a k_pool-deep
    BM25 pool (one inverted-index join, per-query top-k window), then a
    LEFT ANTI join against qrels — relevance tables are query-set-sized,
    broadcastable by AQE — and re-rank the survivors. k_pool must exceed
    k_neg by at least max positives-per-query so the pool never
    underfills after exclusion; a query whose pool holds more positives
    than that margin silently yields fewer than k_neg negatives — size
    k_pool from the qrels positives bound, not from k_neg alone."""
    from pyspark.sql.window import Window

    if k_pool <= k_neg:
        raise ValueError(
            f"k_pool={k_pool} must exceed k_neg={k_neg}: the anti-join "
            "removes positives from the pool before re-ranking"
        )

    pool = bm25_topk(
        postings,
        queries,
        k=k_pool,
        k1=k1,
        b=b,
        id_col=id_col,
        text_col=text_col,
    )
    mined = pool.join(qrels, ["qid", "id"], "left_anti")
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), "id")
    return (
        mined.select("qid", "id", "score")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k_neg)
    )
