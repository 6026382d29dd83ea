"""Mergeable-sketch queries (q89–q90): HLL sketch-table rollups and a
map-only Bloom decontamination pass.

The scale story both pin: at 100 TB you cannot afford a second scan, so
the engine materializes fixed-size summaries once and answers follow-ups
from the summaries alone —

q89 HLL rollup      : per-(event_type, day) HllSketch table of user_id,
                      rolled up to event_type and to the global grain by
                      MERGING sketches (hll_union_agg); verified within
                      ±5% of the exact distinct counts at every grain.
q90 bloom decontam  : eval-set 5-gram shingles -> driver-built power-of-
                      two Bloom bit array -> embedded as an array<bigint>
                      literal -> corpus probed with pure-JVM xxhash64
                      double hashing. NO join, NO shuffle on the corpus
                      side (vs q75's broadcast inverted-index join);
                      verified against the exact containment join: zero
                      false negatives (a law) and observed shingle-level
                      false-positive rate within the design bound.

Sketch internals differ across engines, so — like q20/q68/q69 — the
hashed result is the verified tolerance/law flag itself (DuckDB twin:
SELECT 1). No analog in the reference (exact in-memory HashMaps at
SisConnectorService.java:503-507 are its only "summaries").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table
from . import memo, query

_BLOOMS: dict[tuple, dict] = {}
_FPP = 0.01


@query(
    "q89_hll_rollup_ok",
    oracle="SELECT CAST(1 AS INT) AS ok",
    tags=("agg", "sketch"),
)
def q89(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch-table rollup: build the finest-grain (event_type, day) HLL
    table of distinct user_id ONCE, then answer both the per-event_type
    and the global distinct-user questions by merging sketches — the
    events table is scanned once for the sketch build and once for the
    exact verification side; production keeps only the first. ok=1 iff
    every merged estimate is within 5% of exact at both grains."""
    from ..operators.sketches import hll_rollup, hll_sketch_table

    e = table(spark, sf, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    fine = hll_sketch_table(e, ["event_type", "day"], "user_id", lgk=14)
    by_type = hll_rollup(fine, ["event_type"], "user_id_hll", out="est")
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact")
    )
    per_type_ok = (
        by_type.join(exact, "event_type")
        .agg(
            F.min(
                (F.abs(F.col("est") - F.col("exact")) / F.col("exact")) <= 0.05
            ).alias("ok1")
        )
    )
    global_est = hll_rollup(fine, [], "user_id_hll", out="est")
    global_exact = e.agg(F.count_distinct("user_id").alias("exact"))
    global_ok = global_est.crossJoin(global_exact).select(
        ((F.abs(F.col("est") - F.col("exact")) / F.col("exact")) <= 0.05).alias(
            "ok2"
        )
    )
    return (
        per_type_ok.crossJoin(global_ok)
        .select((F.col("ok1") & F.col("ok2")).cast("int").alias("ok"))
    )


def _doc_shingles(d: DataFrame) -> DataFrame:
    """Distinct 5-gram shingle strings per doc (q75's granularity)."""
    from ..operators.text import tokens

    t = d.select("doc_id", tokens("text").alias("toks"))
    idx = t.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("toks") - 4, F.lit(1)))
        ).alias("i"),
    )
    return idx.select(
        "doc_id",
        F.concat_ws(" ", F.slice("toks", F.col("i"), 5)).alias("s"),
    ).distinct()


@query(
    "q90_bloom_decontam_ok",
    oracle="SELECT CAST(1 AS INT) AS ok",
    tags=("llm", "curation", "sketch"),
)
def q90(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter decontamination: flag corpus docs whose 5-gram
    containment against the eval set (docs id < 20, q75's split) reaches
    0.5, using a driver-built Bloom over the eval shingles probed with
    pure JVM expressions. The corpus side is MAP-ONLY until its per-doc
    aggregate — no join against the eval set, which is the plan you want
    when the verdict (keep/drop) is all you need at 100 TB.

    ok=1 iff (a) zero false negatives vs the exact containment join —
    a LAW of the filter, not a tolerance — and (b) the shingle-level
    false-positive rate among shingles NOT in the eval set is within
    5x the design fpp (slack for the small-sample variance at test SF)."""
    from ..operators.sketches import bloom_might_contain, build_bloom

    d = table(spark, sf, "documents")
    sh = _doc_shingles(d)
    ev_sh = sh.filter(F.col("doc_id") < 20).select("s").distinct()
    corp_sh = sh.filter(F.col("doc_id") >= 20)

    bloom = memo(
        _BLOOMS,
        (id(spark), sf),
        lambda: build_bloom(ev_sh, "s", fpp=_FPP),
        label="bloom_eval_5gram",
    )

    probed = corp_sh.select(
        "doc_id", "s", bloom_might_contain(bloom, F.col("s")).alias("hit")
    )
    per_doc = probed.groupBy("doc_id").agg(
        (F.sum(F.col("hit").cast("int")) / F.count("*")).alias("hit_frac")
    )
    flagged = per_doc.filter(F.col("hit_frac") >= 0.5).select("doc_id")

    # exact side (verification only): containment against the eval union
    exact_frac = (
        corp_sh.join(ev_sh.withColumn("in_eval", F.lit(1)), "s", "left")
        .groupBy("doc_id")
        .agg((F.sum(F.coalesce("in_eval", F.lit(0))) / F.count("*")).alias("c"))
    )
    exact_flagged = exact_frac.filter(F.col("c") >= 0.5).select("doc_id")
    fn = exact_flagged.join(flagged, "doc_id", "left_anti").count()

    # shingle-level FPR among true negatives
    truth = corp_sh.join(
        ev_sh.withColumn("in_eval", F.lit(1)), "s", "left"
    ).select("s", F.coalesce("in_eval", F.lit(0)).alias("in_eval"))
    neg = truth.filter(F.col("in_eval") == 0).select("s").distinct()
    fpr_row = neg.select(
        bloom_might_contain(bloom, F.col("s")).cast("int").alias("hit")
    ).agg(F.avg("hit").alias("fpr")).collect()[0]
    fpr_ok = (fpr_row.fpr or 0.0) <= 5 * _FPP

    from . import ok_flag

    return ok_flag(spark, fn == 0 and fpr_ok)
