"""A/B harness for q267_brand_basket_lift (round-18, VERDICT r17 item 5).

Compares the shipped hash(ok)-repartition self-join form against the
array-pair rewrite (collect_set per order + map-side pair explosion)
on a 32-core box, same session, noop-sink timed (guide §1.4), median
of 5 alternating runs, row sets compared for equality.

Usage: python tools/ab_q267.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_array_variant(spark, sf):
    from pyspark.sql import functions as F

    from ed_fi_x_tpdm_data_ingestion_poc_spark.queries import (
        broadcast_if_small,
    )
    from ed_fi_x_tpdm_data_ingestion_poc_spark.tables import table

    li = table(spark, sf, "lineitem")
    p = table(spark, sf, "part")
    ob = (
        li.join(broadcast_if_small(p), li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("ok"),
                F.col("p_brand").alias("brand"))
        .repartition("ok")
    )
    sets = ob.groupBy("ok").agg(
        F.sort_array(F.collect_set("brand")).alias("bs")
    )
    n = sets.agg(F.count(F.lit(1)).alias("n_orders"))
    ba = sets.select(F.explode("bs").alias("brand")).groupBy("brand").agg(
        F.count(F.lit(1)).alias("na")
    )
    # map-side pair explosion: for i<j emit (bs[i], bs[j])
    pairs = sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("bs"),
                    lambda a, i: F.transform(
                        F.slice(F.col("bs"), i + 2,
                                F.greatest(F.size("bs") - i - 1, F.lit(0))),
                        lambda b: F.struct(a.alias("brand_a"),
                                           b.alias("brand_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.brand_a", "p.brand_b")
    pr = (
        pairs.groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 20)
    )
    return (
        pr.join(
            F.broadcast(ba.select(F.col("brand").alias("brand_a"),
                                  F.col("na").alias("na_a"))),
            "brand_a",
        )
        .join(
            F.broadcast(ba.select(F.col("brand").alias("brand_b"),
                                  F.col("na").alias("na_b"))),
            "brand_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            F.col("n_ab").cast("bigint").alias("support"),
            F.round(
                F.col("n_ab").cast("double") * F.col("n_orders")
                / (F.col("na_a") * F.col("na_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "brand_a", "brand_b")
        .limit(15)
    )


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    from ed_fi_x_tpdm_data_ingestion_poc_spark.queries import all_queries
    from ed_fi_x_tpdm_data_ingestion_poc_spark.session import get_spark

    spark = get_spark()
    spec = all_queries()["q267_brand_basket_lift"]
    cur = lambda: spec.build(spark, SF_DIR)  # noqa: E731
    alt = lambda: build_array_variant(spark, SF_DIR)  # noqa: E731

    assert sorted(map(tuple, cur().collect())) == sorted(
        map(tuple, alt().collect())
    ), "variants disagree"

    for fn, name in ((cur, "current"), (alt, "array")):
        noop(fn())  # warm
    a, b = [], []
    for _ in range(5):
        a.append(noop(cur()))
        b.append(noop(alt()))
    print("RESULT current median", round(statistics.median(a), 3), a)
    print("RESULT array   median", round(statistics.median(b), 3), b)


if __name__ == "__main__":
    main()
