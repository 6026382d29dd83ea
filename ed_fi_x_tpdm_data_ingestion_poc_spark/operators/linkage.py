"""Record linkage (entity resolution): blocked fuzzy matching with
edit-distance scoring and best-match resolution.

The scalable ER recipe (Christen 2012, "Data Matching"; Papadakis et al.
2020 survey) is three bounded stages, each expressible as plain
DataFrame ops so Catalyst/AQE keep the whole thing JVM-side:

  1. BLOCKING — candidate pairs come only from records sharing a cheap
     deterministic block key (phonetic code, key substring, sorted
     neighborhood slice). Cost drops from |A|x|B| to sum_b |A_b|x|B_b|.
  2. BLOCK PURGING — a block whose candidate product exceeds a cap is
     dropped outright (standard practice: oversized blocks are
     near-useless for discrimination and carry all the quadratic cost;
     at web scale a single degenerate key — empty string, 'N/A' —
     would otherwise dominate the whole join).
  3. SCORING + RESOLUTION — surviving pairs are scored with an
     edit-distance (JVM `levenshtein`, whole-stage codegen) and each
     left record keeps its single best match via one `min_by`
     aggregate (total (distance, id) order, so ties are deterministic).

Everything shuffles at most once per stage on the block/id keys; the
block-size side of the purge join is block-cardinality-sized and
broadcast. No Python UDF anywhere.

No reference analog (the Java connector matches records only by exact
primary key, e.g. banner-connector's per-id GET path); this is part of
the brief-mandated large-scale curation surface — the same
candidate-generation-then-exact-verify contract as the MinHash/LSH
dedup family in operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_candidates(
    left: DataFrame,
    right: DataFrame,
    block_col: str = "block",
    max_block_product: int = 1_000_000,
) -> DataFrame:
    """Equi-join `left` x `right` on `block_col`, purging blocks whose
    candidate product |L_b| * |R_b| exceeds `max_block_product`.

    Inputs carry their payload columns; the only contract is that both
    sides have `block_col`. Output: every surviving candidate pair,
    left columns first. The per-block size tables are
    block-cardinality-sized (bounded by the block-key domain), so both
    are broadcast; the candidate join itself shuffles each side once on
    the block key."""
    lsz = left.groupBy(block_col).agg(F.count(F.lit(1)).alias("_ln"))
    rsz = right.groupBy(block_col).agg(F.count(F.lit(1)).alias("_rn"))
    ok_blocks = (
        lsz.join(rsz, block_col)
        .where(F.col("_ln") * F.col("_rn") <= F.lit(max_block_product))
        .select(block_col)
    )
    lf = left.join(F.broadcast(ok_blocks), block_col)
    rf = right.join(F.broadcast(ok_blocks), block_col)
    return lf.join(rf, block_col)


def link_best_match(
    dirty: DataFrame,
    clean: DataFrame,
    dirty_id: str,
    clean_id: str,
    dirty_name: str,
    clean_name: str,
    block_col: str = "block",
    max_dist: int = 3,
    max_block_product: int = 1_000_000,
) -> DataFrame:
    """One row per dirty record that found any candidate within
    `max_dist`: (dirty_id, matched clean_id, distance, n_cand).

    Best = smallest (levenshtein, clean_id) — a total order, so the
    resolution is deterministic regardless of partitioning. `n_cand`
    counts the scored candidates that passed the distance gate (an ER
    quality diagnostic: a dirty record with many near-threshold
    candidates signals a weak block key)."""
    d = dirty.select(
        F.col(block_col),
        F.col(dirty_id).alias("_did"),
        F.col(dirty_name).alias("_dnm"),
    )
    c = clean.select(
        F.col(block_col),
        F.col(clean_id).alias("_cid"),
        F.col(clean_name).alias("_cnm"),
    )
    cand = blocked_candidates(d, c, block_col, max_block_product)
    scored = cand.select(
        "_did",
        "_cid",
        F.levenshtein("_dnm", "_cnm").alias("_dist"),
    ).where(F.col("_dist") <= F.lit(max_dist))
    best = scored.groupBy("_did").agg(
        F.min_by(
            F.struct(F.col("_cid").alias("cid"), F.col("_dist").alias("d")),
            F.struct(F.col("_dist").alias("d"), F.col("_cid").alias("cid")),
        ).alias("_best"),
        F.count(F.lit(1)).alias("n_cand"),
    )
    return best.select(
        F.col("_did").alias(dirty_id),
        F.col("_best.cid").alias(clean_id),
        F.col("_best.d").alias("dist"),
        "n_cand",
    )
