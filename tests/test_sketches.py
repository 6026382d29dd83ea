"""Sketch operators: HLL sketch-table rollups, portable Bloom filter,
shard export write path, segment-level dedup semantics."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
    bloom_might_contain,
    bloom_params,
    build_bloom,
    hll_rollup,
    hll_sketch_table,
)


def test_bloom_params_power_of_two():
    for n, fpp in [(1, 0.01), (100, 0.01), (5000, 0.001), (10, 0.5)]:
        m, k = bloom_params(n, fpp)
        assert m >= 64 and (m & (m - 1)) == 0, (n, fpp, m)
        assert k >= 1


def test_bloom_no_false_negatives(spark):
    """The law: every inserted value must probe positive."""
    members = spark.range(500).select(
        F.concat(F.lit("member-"), F.col("id")).alias("s")
    )
    bloom = build_bloom(members, "s", fpp=0.01)
    hits = members.select(
        bloom_might_contain(bloom, F.col("s")).alias("hit")
    ).agg(F.sum(F.col("hit").cast("int")).alias("n")).collect()[0]
    assert hits.n == 500


def test_bloom_fpr_within_bound(spark):
    """Disjoint probes flag at ~fpp; allow 5x slack for sample variance."""
    members = spark.range(2000).select(
        F.concat(F.lit("in-"), F.col("id")).alias("s")
    )
    bloom = build_bloom(members, "s", fpp=0.01)
    out = spark.range(20000).select(
        F.concat(F.lit("out-"), F.col("id")).alias("s")
    )
    fpr = out.select(
        bloom_might_contain(bloom, F.col("s")).cast("int").alias("hit")
    ).agg(F.avg("hit").alias("fpr")).collect()[0].fpr
    assert fpr <= 0.05, fpr


def test_bloom_probe_plan_is_map_only(spark):
    """The probe must compose as a pure projection: no join, no exchange,
    no Python — that is the whole point vs. the broadcast-join path."""
    members = spark.range(100).select(F.col("id").cast("string").alias("s"))
    bloom = build_bloom(members, "s", fpp=0.01)
    probe = spark.range(1000).select(
        F.col("id").cast("string").alias("s")
    ).select(bloom_might_contain(bloom, F.col("s")).alias("hit"))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    for bad in ("Join", "Exchange", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, f"{bad} in probe plan:\n{plan}"


def test_hll_rollup_matches_direct_sketch(spark):
    """Merging fine-grain sketches must agree with sketching the coarse
    grain directly to well under the sketch's own error bound (union can
    change the internal representation mode, so bit-exact equality does
    not hold), and land within 5% of the true distinct count."""
    df = spark.range(20000).select(
        (F.col("id") % 4).alias("g"),
        (F.col("id") % 40).alias("sub"),
        (F.col("id") % 7000).alias("v"),
    )
    fine = hll_sketch_table(df, ["g", "sub"], "v", lgk=14)
    rolled = hll_rollup(fine, ["g"], "v_hll", out="est")
    direct = df.groupBy("g").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v", F.lit(14))).alias("direct")
    )
    exact = df.groupBy("g").agg(F.count_distinct("v").alias("exact"))
    rows = rolled.join(direct, "g").join(exact, "g").collect()
    assert len(rows) == 4
    for r in rows:
        assert abs(r.est - r.direct) / r.direct <= 0.01, (r.g, r.est, r.direct)
        assert abs(r.est - r.exact) / r.exact <= 0.05


def test_hll_global_rollup(spark):
    df = spark.range(5000).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("v")
    )
    fine = hll_sketch_table(df, ["g"], "v", lgk=14)
    est = hll_rollup(fine, [], "v_hll", out="est").collect()[0].est
    assert abs(est - 5000) / 5000 <= 0.05


def test_shard_export_write_path(spark, sf_dir, tmp_path):
    """q91's write half: partitionBy('shard') parquet export — every doc
    lands in exactly one shard dir and the round-trip preserves rows."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.queries import all_queries
    from ed_fi_x_tpdm_data_ingestion_poc_spark.tables import table

    d = table(spark, sf_dir, "documents")
    shard = F.pmod(
        F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296)),
        F.lit(16),
    )
    out = str(tmp_path / "shards")
    (
        d.withColumn("shard", shard)
        .repartition("shard")
        .write.option("maxRecordsPerFile", 1000)
        .partitionBy("shard")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    assert back.count() == d.count()
    n_shards = back.select("shard").distinct().count()
    manifest = all_queries()["qz91_shard_export"].build(spark, sf_dir)
    assert manifest.count() == n_shards


def test_segment_dedup_plants_duplicate(spark, tmp_path):
    """A doc duplicated verbatim must report dup_frac 1.0 on all its full
    segments; a unique doc with unique words reports 0.0."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.queries import all_queries

    text_dup = " ".join(f"w{i % 17}" for i in range(48))
    text_uni = " ".join(f"unique{i}" for i in range(48))
    df = spark.createDataFrame(
        [
            (1, text_dup, "en", "a", len(text_dup)),
            (2, text_dup, "en", "a", len(text_dup)),
            (3, text_uni, "en", "a", len(text_uni)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    spec = all_queries()["qz92_segment_dedup"]
    rows = {
        r.doc_id: r for r in spec.build(spark, str(tmp_path)).collect()
    }
    assert rows[1].dup_frac == 1.0 and rows[2].dup_frac == 1.0
    assert rows[3].dup_frac == 0.0
    assert rows[1].n_seg == 3  # 48 tokens -> 3 full 16-token segments


def test_bloom_union_mergeable(spark):
    """Union law: bloom(A) | bloom(B) ≡ membership in A ∪ B — zero false
    negatives for members of either side; params must match."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        bloom_params,
        bloom_union,
    )

    pa = bloom_params(1000, 0.01)
    a = spark.range(500).select(F.concat(F.lit("a-"), F.col("id")).alias("s"))
    b = spark.range(500).select(F.concat(F.lit("b-"), F.col("id")).alias("s"))
    ba = build_bloom(a, "s", params=pa)
    bb = build_bloom(b, "s", params=pa)
    u = bloom_union(ba, bb)
    both = a.unionByName(b)
    hits = both.select(
        bloom_might_contain(u, F.col("s")).cast("int").alias("h")
    ).agg(F.sum("h").alias("n")).collect()[0]
    assert hits.n == 1000
    with pytest.raises(ValueError, match="identical"):
        bloom_union(ba, build_bloom(b, "s", fpp=0.5))


def test_bloom_explicit_params_validated(spark):
    """Explicit (m, k) must be a power-of-two m >= 64 and k >= 1: any
    other m breaks the signed-pmod/uint64-% probe equivalence (silent
    false negatives) or under-allocates the word array."""
    a = spark.range(10).select(F.col("id").cast("string").alias("s"))
    for bad_m in (0, 63, 100, 96):  # zero, <64, non-pow2, 64∤m-pow2 mix
        with pytest.raises(ValueError, match="power of two"):
            build_bloom(a, "s", params=(bad_m, 3))
    with pytest.raises(ValueError, match="k must be"):
        build_bloom(a, "s", params=(128, 0))
    ok = build_bloom(a, "s", params=(128, 3))
    assert ok["m"] == 128 and len(ok["words"]) == 2


def test_bloom_property_random_strings(spark):
    """Property sweep (hypothesis-style deterministic corpus): arbitrary
    unicode-ish member strings all probe positive across fpp settings."""
    vals = [f"v{i}-é中{'x' * (i % 7)}" for i in range(300)]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    for fpp in (0.1, 0.01, 0.001):
        bloom = build_bloom(df, "s", fpp=fpp)
        n = df.select(
            bloom_might_contain(bloom, F.col("s")).cast("int").alias("h")
        ).agg(F.sum("h").alias("n")).collect()[0].n
        assert n == 300, (fpp, n)


def test_cms_exact_when_wide_and_merge_linear(spark):
    """With w far above the distinct count every value gets clean cells
    in at least one depth's view... stronger: the sketch is EXACT for
    any value whose d cells hold only its own count — with 20 distinct
    values in w=4096 the min over 4 depths collides with nothing whp for
    this fixed hash; pin the measured exactness plus the hard laws:
    never underestimates, and merge is cell-identical to a single
    build."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        cms_build,
        cms_merge,
        cms_point,
    )

    rows = [(f"k{i % 20}",) for i in range(400)]  # each key exactly 20x
    df = spark.createDataFrame(rows, "s string")
    cms = cms_build(df, "s", d=4, w=4096)
    assert cms["n"] == 400
    probe = spark.createDataFrame([(f"k{i}",) for i in range(20)], "s string")
    got = probe.select("s", cms_point(cms, F.col("s")).alias("e")).collect()
    assert all(r.e >= 20 for r in got)  # law: never under
    assert all(r.e == 20 for r in got)  # measured exact at this width

    a = cms_build(df.limit(100), "s", d=4, w=4096)
    b_rows = spark.createDataFrame(rows[100:], "s string")
    b = cms_build(b_rows, "s", d=4, w=4096)
    merged = cms_merge(a, b)
    assert merged["tables"] == cms["tables"] and merged["n"] == 400

    with pytest.raises(ValueError, match="identical"):
        cms_merge(a, cms_build(df, "s", d=4, w=2048))
    with pytest.raises(ValueError, match="d >= 1"):
        cms_build(df, "s", d=0, w=16)


def test_cms_overestimate_law_property(spark):
    """Hypothesis-style sweep without fixture luck: for arbitrary skewed
    string multisets and tight widths (heavy collisions), the point
    estimate must NEVER undercount any present value."""
    for seed, w in [(1, 16), (2, 32), (3, 64)]:
        vals = [f"s{(i * seed) % 23}" for i in range(500)]
        from collections import Counter

        truth = Counter(vals)
        df = spark.createDataFrame([(v,) for v in vals], "s string")
        from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
            cms_build,
            cms_point,
        )

        cms = cms_build(df, "s", d=3, w=w)
        probe = spark.createDataFrame(
            [(k,) for k in truth], "s string"
        )
        got = probe.select(
            "s", cms_point(cms, F.col("s")).alias("e")
        ).collect()
        for r in got:
            assert r.e >= truth[r.s], (seed, w, r.s, r.e, truth[r.s])


def test_cms_probe_plan_is_map_only(spark):
    """Like the bloom probe, cms_point must compose as a pure projection
    — no join, no exchange, no Python — so frequency gating can ride any
    scan for free."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        cms_build,
        cms_point,
    )

    vals = spark.range(200).select(F.col("id").cast("string").alias("s"))
    cms = cms_build(vals, "s", d=4, w=256)
    probe = spark.range(1000).select(
        F.col("id").cast("string").alias("s")
    ).select(cms_point(cms, F.col("s")).alias("e"))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    for bad in ("Join", "Exchange", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, f"{bad} in probe plan:\n{plan}"


def test_cms_rejects_negative_weights(spark):
    """cms_point's never-underestimates law assumes non-negative updates
    (Cormode & Muthukrishnan 2005); a signed weight must be rejected at
    build time, not silently break the law later."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        cms_build,
    )

    df = spark.createDataFrame(
        [("a", 3), ("b", -1), ("c", 2)], "s string, wt int"
    )
    with pytest.raises(ValueError, match="non-negative"):
        cms_build(df, "s", weight=F.col("wt"), d=2, w=32)
    # non-negative weights still build fine (zero allowed)
    ok = cms_build(
        df.where(F.col("wt") >= 0), "s", weight=F.col("wt"), d=2, w=32
    )
    assert ok["n"] == 5


# ---------------------------------------------------------------- KMV --


def _kmv_df(spark, values):
    return spark.createDataFrame([(v,) for v in values], "v bigint")


def test_kmv_exact_below_k(spark):
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        kmv_build,
        kmv_estimate,
    )

    sk = kmv_build(_kmv_df(spark, list(range(100)) * 3), "v", k=256)
    assert len(sk["mins"]) == 100
    assert kmv_estimate(sk) == 100.0


def test_kmv_estimate_within_bound(spark):
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        kmv_build,
        kmv_estimate,
    )

    n, k = 20_000, 512
    sk = kmv_build(_kmv_df(spark, range(n)), "v", k=k)
    assert len(sk["mins"]) == k
    # deterministic given xxhash64; expected rel err ~ 1/sqrt(k-2) ~ 4.4%
    assert abs(kmv_estimate(sk) - n) / n < 0.15


def test_kmv_merge_equals_build_on_union(spark):
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        kmv_build,
        kmv_merge,
    )

    a = kmv_build(_kmv_df(spark, range(0, 3000)), "v", k=128)
    b = kmv_build(_kmv_df(spark, range(2000, 5000)), "v", k=128)
    merged = kmv_merge(a, b)
    direct = kmv_build(_kmv_df(spark, range(0, 5000)), "v", k=128)
    assert merged["mins"] == direct["mins"]  # exact, not approximate


def test_kmv_merge_rejects_mismatched_k(spark):
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        kmv_build,
        kmv_merge,
    )

    a = kmv_build(_kmv_df(spark, range(10)), "v", k=64)
    b = kmv_build(_kmv_df(spark, range(10)), "v", k=128)
    with pytest.raises(ValueError, match="identical k"):
        kmv_merge(a, b)


def test_kmv_build_rejects_tiny_k(spark):
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        kmv_build,
    )

    with pytest.raises(ValueError, match="k >= 2"):
        kmv_build(_kmv_df(spark, range(10)), "v", k=1)


def test_kmv_intersect_exact_when_small(spark):
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        kmv_build,
        kmv_intersect_estimate,
    )

    a = kmv_build(_kmv_df(spark, range(0, 300)), "v", k=1024)
    b = kmv_build(_kmv_df(spark, range(250, 600)), "v", k=1024)
    # both sketches exact (n < k) -> intersection exact
    assert kmv_intersect_estimate(a, b) == 50.0


def test_kmv_intersect_small_overlap_of_large_sets(spark):
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        kmv_build,
        kmv_intersect_estimate,
    )

    # |A|=|B|=20k, overlap 1000 (~2.6% of union): the regime where HLL
    # inclusion-exclusion noise swamps the signal
    a = kmv_build(_kmv_df(spark, range(0, 20_000)), "v", k=2048)
    b = kmv_build(_kmv_df(spark, range(19_000, 39_000)), "v", k=2048)
    est = kmv_intersect_estimate(a, b)
    assert abs(est - 1000) / 1000 < 0.35


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters


def _mg_df(spark, items):
    return spark.createDataFrame([(str(i),) for i in items], "v string")


def test_mg_compress_subtracts_k_plus_first():
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        _mg_compress,
    )

    comp, cut = _mg_compress({"a": 10, "b": 7, "c": 3, "d": 3}, 2)
    assert cut == 3
    assert comp == {"a": 7, "b": 4}
    # already within budget: untouched
    comp, cut = _mg_compress({"a": 5, "b": 1}, 2)
    assert (comp, cut) == ({"a": 5, "b": 1}, 0)


def test_mg_build_exact_when_vocab_fits(spark):
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        mg_build,
    )

    s = mg_build(_mg_df(spark, ["x"] * 6 + ["y"] * 3 + ["z"]), "v", k=8)
    assert s["n"] == 10
    assert s["err"] == 0
    assert s["counters"] == {"x": 6, "y": 3, "z": 1}


def test_mg_laws_on_skewed_stream(spark):
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        mg_build,
    )

    # 500 'hot' + 100 each of 20 others + 300 singletons, k=4
    items = (["hot"] * 500
             + [f"w{i}" for i in range(20) for _ in range(100)]
             + [f"s{i}" for i in range(300)])
    true = {"hot": 500, **{f"w{i}": 100 for i in range(20)},
            **{f"s{i}": 1 for i in range(300)}}
    s = mg_build(_mg_df(spark, items), "v", k=4)
    n = len(items)
    assert s["n"] == n
    assert 0 <= s["err"] <= 2 * n / 5
    for item, est in s["counters"].items():
        assert est <= true[item]
        assert true[item] - est <= s["err"]
    for item, cnt in true.items():
        if cnt > s["err"]:
            assert item in s["counters"]


def test_mg_merge_disjoint_shards(spark):
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        mg_build,
        mg_merge,
    )

    a_items = ["a"] * 50 + [f"x{i}" for i in range(40)]
    b_items = ["a"] * 30 + ["b"] * 45 + [f"y{i}" for i in range(40)]
    a = mg_build(_mg_df(spark, a_items), "v", k=4)
    b = mg_build(_mg_df(spark, b_items), "v", k=4)
    m = mg_merge(a, b)
    n = len(a_items) + len(b_items)
    assert m["n"] == n
    true = {"a": 80, "b": 45}
    for item, est in m["counters"].items():
        t = true.get(item, 1)
        assert est <= t and t - est <= m["err"]
    for item, cnt in true.items():
        if cnt > m["err"]:
            assert item in m["counters"]


def test_mg_validation():
    import pytest

    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        mg_merge,
    )

    with pytest.raises(ValueError, match="identical k"):
        mg_merge({"counters": {}, "n": 0, "err": 0, "k": 4},
                 {"counters": {}, "n": 0, "err": 0, "k": 8})


def test_mg_build_rejects_bad_k(spark):
    import pytest

    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        mg_build,
    )

    with pytest.raises(ValueError, match="k must be"):
        mg_build(_mg_df(spark, ["a"]), "v", k=0)


# ---------------------------------------------------------------------------
# CMS inner product (join-size estimation)


def test_cms_inner_product_laws(spark):
    import math

    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        cms_build,
        cms_inner_product,
        cms_merge,
    )

    a_df = spark.createDataFrame(
        [(i % 10,) for i in range(300)], "k int"
    )
    b_df = spark.createDataFrame(
        [(i % 25,) for i in range(200)], "k int"
    )
    a = cms_build(a_df, "k", d=4, w=512)
    b = cms_build(b_df, "k", d=4, w=512)
    # true inner product: keys 0..9 appear 30x in a, 8x in b
    true = 10 * 30 * 8
    est = cms_inner_product(a, b)
    assert true <= est <= true + math.e * a["n"] * b["n"] / a["w"]
    # merge-transparency: cell sums commute with the product
    h0 = spark.createDataFrame([(i % 10,) for i in range(0, 300, 2)], "k int")
    h1 = spark.createDataFrame([(i % 10,) for i in range(1, 300, 2)], "k int")
    m = cms_merge(cms_build(h0, "k", d=4, w=512), cms_build(h1, "k", d=4, w=512))
    assert cms_inner_product(m, b) == est


def test_cms_inner_product_rejects_shape_mismatch():
    import pytest

    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sketches import (
        cms_inner_product,
    )

    a = {"tables": [[0] * 4], "d": 1, "w": 4, "n": 0}
    b = {"tables": [[0] * 8], "d": 1, "w": 8, "n": 0}
    with pytest.raises(ValueError, match="identical"):
        cms_inner_product(a, b)
