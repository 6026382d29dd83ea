"""Sampling operator tests (operators/sampling.py): determinism, exact
per-stratum counts, and the shuffle-free plan shape of hash sampling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sampling import (
    cap_per_stratum,
    hash_sample,
    stratified_sample_exact,
)
from ed_fi_x_tpdm_data_ingestion_poc_spark.plans import audit
from ed_fi_x_tpdm_data_ingestion_poc_spark.tables import table


def test_hash_sample_deterministic_subset(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    s1 = hash_sample(d, 0.3, id_col="doc_id").select("doc_id")
    s2 = hash_sample(d, 0.3, id_col="doc_id").select("doc_id")
    ids1 = {r[0] for r in s1.collect()}
    ids2 = {r[0] for r in s2.collect()}
    assert ids1 == ids2  # deterministic across runs
    assert ids1 <= {r[0] for r in d.select("doc_id").collect()}
    # a larger threshold strictly contains a smaller one (monotone in f)
    ids_half = {r[0] for r in hash_sample(d, 0.6, id_col="doc_id").select("doc_id").collect()}
    assert ids1 <= ids_half


def test_hash_sample_is_pure_filter(spark, sf_dir):
    """The scale property: no exchange, no join, no Python — a filter."""
    d = table(spark, sf_dir, "documents")
    facts = audit(hash_sample(d, 0.3, id_col="doc_id"))
    assert facts.exchanges == 0
    assert facts.joins == 0
    assert facts.python_evals == 0 and facts.arrow_evals == 0


def test_stratified_sample_exact_counts(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    frac = 0.2
    out = stratified_sample_exact(d, ["lang"], frac, id_col="doc_id")
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    want = {
        r["lang"]: math.ceil(r["n"] * frac)
        for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_cap_per_stratum(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    out = cap_per_stratum(d, ["lang"], 3, id_col="doc_id")
    counts = [r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()]
    assert counts and max(counts) <= 3
    # deterministic: same cap twice -> same ids
    a = {r[0] for r in out.select("doc_id").collect()}
    b = {r[0] for r in cap_per_stratum(d, ["lang"], 3, id_col="doc_id").select("doc_id").collect()}
    assert a == b


def test_weighted_reservoir_laws(spark):
    """A-ES reservoir: exactly k rows, deterministic per salt, and across
    many salts heavy rows are included far more often than light ones
    (inclusion probability proportional to weight)."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sampling import (
        weighted_reservoir_exact,
    )

    # ids 0..199: weight 1000 for the first 20, weight 10 for the rest
    df = spark.createDataFrame(
        [(i, 1000 if i < 20 else 10) for i in range(200)], "id long, w long"
    )
    a = weighted_reservoir_exact(df, 30, "w", id_col="id", salt=1)
    rows_a = sorted(r.id for r in a.collect())
    assert len(rows_a) == 30
    rows_a2 = sorted(
        r.id
        for r in weighted_reservoir_exact(
            df, 30, "w", id_col="id", salt=1
        ).collect()
    )
    assert rows_a == rows_a2  # deterministic

    heavy = light = 0
    for salt in range(25):
        got = {
            r.id
            for r in weighted_reservoir_exact(
                df, 30, "w", id_col="id", salt=salt
            ).collect()
        }
        heavy += sum(1 for i in got if i < 20)
        light += sum(1 for i in got if i >= 20)
    # 20 rows at 100x the weight of the other 180: heavy rows must be
    # included at a far higher RATE (per-row inclusion frequency)
    assert heavy / 20 > 5 * (light / 180), (heavy, light)


def test_epoch_shuffle_is_exact_permutation(spark, sf_dir):
    """Law 1: epoch_shuffle emits a PERMUTATION of its input — the
    multiset of ids is unchanged (nothing dropped, nothing duplicated),
    and every row keeps its payload columns."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sampling import (
        epoch_shuffle,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = epoch_shuffle(d, "doc_id", epoch=3, shards=8, n_partitions=8)
    got = sorted((r.doc_id, r.n_chars) for r in out.collect())
    want = sorted((r.doc_id, r.n_chars) for r in d.collect())
    assert got == want


def test_epoch_shuffle_same_epoch_reproducible(spark, sf_dir):
    """Law 2: the ORDER is a pure function of (id, epoch) — two
    independent builds at the same epoch produce the identical sequence
    (per (shard, key, id) sort; file split points may differ, the
    sequence may not)."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sampling import (
        epoch_shuffle,
    )

    d = table(spark, sf_dir, "documents").select("doc_id")
    def seq():
        out = epoch_shuffle(d, "doc_id", epoch=5, shards=4, n_partitions=4)
        return [
            r.doc_id
            for r in out.orderBy("shard", "epoch_key", "doc_id").collect()
        ]
    assert seq() == seq()


def test_epoch_shuffle_epochs_decorrelated(spark, sf_dir):
    """Law 3 (the reason the key is NOT mul_hash32(id + epoch)): orders
    from different epochs are rank-decorrelated. The naive additive salt
    is a near-rotation of the same order (measured Spearman rho ~ -0.42
    between epochs 0 and 1); the xor-mask + xorshift key must stay
    inside |rho| < 0.1 for several epoch pairs."""
    import numpy as np

    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sampling import (
        epoch_order_key,
    )

    d = table(spark, sf_dir, "documents").select("doc_id")
    keys = d.select(
        "doc_id",
        *[
            epoch_order_key("doc_id", e).alias(f"k{e}")
            for e in (0, 1, 2, 7)
        ],
    ).toPandas()
    assert len(keys) > 100

    def rho(a, b):
        ra = np.argsort(np.argsort(a))
        rb = np.argsort(np.argsort(b))
        return float(np.corrcoef(ra, rb)[0, 1])

    for e1, e2 in [(0, 1), (0, 2), (1, 2), (0, 7)]:
        r = rho(keys[f"k{e1}"].to_numpy(), keys[f"k{e2}"].to_numpy())
        assert abs(r) < 0.1, (e1, e2, r)
    # sanity: a key correlates perfectly with itself
    assert rho(keys["k0"].to_numpy(), keys["k0"].to_numpy()) > 0.999


def test_epoch_shuffle_plan_is_one_range_exchange(spark, sf_dir):
    """Law 4 (scale shape): the export path is exactly ONE exchange —
    the range partition — plus local sorts; no join, no Python, no
    global sort to a single partition."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sampling import (
        epoch_shuffle,
    )

    import re

    from ed_fi_x_tpdm_data_ingestion_poc_spark.plans import plan_string

    d = table(spark, sf_dir, "documents").select("doc_id")
    df = epoch_shuffle(d, "doc_id", epoch=1, shards=8, n_partitions=16)
    # count unique exchange NODE IDs, not raw regex hits — formatted
    # explain happens to list each node twice (tree + details) today,
    # but pinning that quirk makes the test fail spuriously on a
    # format change (ADVICE r16). Exactly one exchange, and it must be
    # the RANGE partition (not a hash or single-partition exchange).
    text = plan_string(df)
    ids = set(re.findall(r"\((\d+)\) Exchange\b", text))
    assert len(ids) == 1, text
    assert re.search(r"rangepartitioning", text, re.I), text
    facts = audit(df)
    assert facts.joins == 0
    assert facts.python_evals == 0 and facts.arrow_evals == 0


def test_kfold_assign_laws(spark, sf_dir):
    """k-fold laws: (1) partition — every row in exactly one fold, ids
    preserved; (2) exact per-stratum balance — within each stratum the
    fold sizes differ by at most one; (3) determinism — same assignment
    across two builds."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sampling import (
        kfold_assign,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    k = 4
    out = kfold_assign(d, ["lang"], k, id_col="doc_id")
    rows = out.collect()
    assert sorted(r.doc_id for r in rows) == sorted(
        r.doc_id for r in d.collect()
    )
    assert all(0 <= r.fold < k for r in rows)
    from collections import Counter

    per = Counter((r.lang, r.fold) for r in rows)
    langs = {r.lang for r in rows}
    for lang in langs:
        sizes = [per.get((lang, f), 0) for f in range(k)]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
    again = {(r.doc_id, r.fold) for r in kfold_assign(
        d, ["lang"], k, id_col="doc_id").collect()}
    assert again == {(r.doc_id, r.fold) for r in rows}


def test_bootstrap_ci_brackets_the_mean(spark, sf_dir):
    """q290 sanity: the percentile interval is ordered (lo < hi), both
    ends sit near the point estimate (within a loose 20% band at test
    scale), and re-evaluation is identical (hash-seeded, no rand())."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.queries import all_queries

    q = all_queries()["q290_bootstrap_ci"]
    r1 = q.build(spark, sf_dir).collect()[0]
    assert r1.ci_lo < r1.ci_hi
    assert abs(r1.ci_lo - r1.mean_price) / r1.mean_price < 0.2
    assert abs(r1.ci_hi - r1.mean_price) / r1.mean_price < 0.2
    r2 = q.build(spark, sf_dir).collect()[0]
    assert tuple(r1) == tuple(r2)


def test_pois_key_thresholds_match_double_compare():
    """Round-17 q290 hot-path change: the Poisson weight used to come
    from u = (key + 0.5) / 2^32 compared against the _POIS double
    literals; it now compares the integer key against precomputed
    integer thresholds. Pin the equivalence: for every threshold, the
    boundary keys T-1, T, T+1 (and the domain edges) produce the same
    weight under both rules — T is the LAST key whose u sorts below
    the literal, exactly."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.queries.stats_q import (
        _POIS,
        _POIS_KEYS,
    )

    def w_double(key: int) -> int:
        u = (key + 0.5) / 4294967296.0  # Python float == IEEE double
        for i, p in enumerate(_POIS):
            if u < p:
                return i
        return 4

    def w_int(key: int) -> int:
        for i, t in enumerate(_POIS_KEYS):
            if key <= t:
                return i
        return 4

    probes = {0, 1, 2**32 - 2, 2**32 - 1}
    for t in _POIS_KEYS:
        probes.update({t - 1, t, t + 1})
    for k in sorted(probes):
        assert w_int(k) == w_double(k), (k, w_int(k), w_double(k))
    # thresholds are strictly increasing and interior to the key domain
    assert list(_POIS_KEYS) == sorted(set(_POIS_KEYS))
    assert 0 < _POIS_KEYS[0] and _POIS_KEYS[-1] < 2**32 - 1


def test_zorder_buckets_bound_both_dimensions(spark, sf_dir):
    """The z-order payoff, quantified: bucket a 2-D keyspace 64 ways by
    (a) the Morton key and (b) the lexicographic (x, y) sort. Under
    z-order EVERY bucket spans a narrow range of BOTH dims (so file
    stats prune predicates on either column); under lex sort the
    y-range of a typical bucket is the full domain. Also pins the
    interleave arithmetic against a pure-Python reference."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sampling import (
        zorder_key,
    )

    # dense 128 x 128 grid (a sparse real table hides the contrast: if
    # each lex bucket holds only ~1 distinct x, y is trivially bounded)
    grid = spark.range(128 * 128).select(
        (F.col("id") % 128).alias("x"),
        (F.col("id") / 128).cast("bigint").alias("y"),
    )
    z = grid.select(
        "x", "y", zorder_key("x", "y", 8).alias("zv")
    ).collect()

    def ref(x, y):
        out = 0
        for i in range(8):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    for r in z[:300]:
        assert r.zv == ref(r.x, r.y), (r.x, r.y, r.zv)

    # per-bucket spans: z-order bounds both dims; lex bounds only x
    from collections import defaultdict

    zspan_x, zspan_y = defaultdict(set), defaultdict(set)
    for r in z:
        b = r.zv * 64 // 65536
        zspan_x[b].add(r.x)
        zspan_y[b].add(r.y)
    lex = sorted((r.x, r.y) for r in z)
    n = len(lex)
    lspan_y = defaultdict(set)
    for i, (x, y) in enumerate(lex):
        lspan_y[min(i * 64 // n, 63)].add(y)

    def avg_span(d):
        return sum(max(s) - min(s) for s in d.values()) / len(d)

    zx, zy = avg_span(zspan_x), avg_span(zspan_y)
    ly = avg_span(lspan_y)
    # 64 z-buckets tile the 128x128 grid into 16x32 rectangles: both
    # dims bounded far below the 127-wide domain
    assert zx <= 32 and zy <= 32, (zx, zy)
    # lexicographic buckets (2 full x-columns each) leave y at full width
    assert ly >= 120, ly
    assert ly > 3 * zy, (ly, zy)


def test_epoch_shuffle_write_roundtrip_preserves_order(spark, sf_dir,
                                                       tmp_path):
    """The export contract end-to-end: epoch_shuffle -> parquet write
    partitioned by shard -> read back. Within every shard directory,
    rows sorted by (epoch_key, id) reproduce exactly the operator's
    in-memory epoch order, and shard membership matches the stable
    assignment — i.e. the thing a training loader reads off disk IS the
    epoch permutation."""
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sampling import (
        epoch_shuffle,
    )

    d = table(spark, sf_dir, "documents").select("doc_id")
    out = epoch_shuffle(d, "doc_id", epoch=2, shards=4, n_partitions=4)
    want = [
        (r.shard, r.doc_id)
        for r in out.orderBy("shard", "epoch_key", "doc_id").collect()
    ]
    path = str(tmp_path / "epoch2")
    out.write.partitionBy("shard").parquet(path)
    back = spark.read.parquet(path)
    got = [
        (r.shard, r.doc_id)
        for r in back.orderBy("shard", "epoch_key", "doc_id").collect()
    ]
    assert got == want


def test_bootstrap_arrow_kernel_matches_jvm_hash(spark):
    """Round-17 q290 step-2 change: the B x orders weight pass moved
    from JVM expressions (mul_hash32 chain over an exploded cross
    join) into a vectorized numpy kernel inside mapInArrow. Pin the
    kernel to the canonical JVM arithmetic on adversarial orderkeys —
    0, 1, 2^31-1, 2^32-1, 2^32, 2^32+7, 2^48+123 (the pmod-vs-mask and
    xor-width edge cases) — by computing per-(key, b) weights both
    ways and comparing exactly."""
    import numpy as np

    from pyspark.sql import functions as F
    from ed_fi_x_tpdm_data_ingestion_poc_spark.operators.sampling import (
        mul_hash32,
    )
    from ed_fi_x_tpdm_data_ingestion_poc_spark.queries.stats_q import (
        _BOOT_B,
        _POIS_KEYS,
    )

    keys = [0, 1, 2**31 - 1, 2**32 - 1, 2**32, 2**32 + 7, 2**48 + 123]
    # JVM side: the exact expression q290 used pre-rewrite
    e = (
        spark.createDataFrame([(k,) for k in keys], "ok long")
        .crossJoin(
            spark.range(_BOOT_B).select(F.col("id").cast("int").alias("b"))
        )
    )
    mask = mul_hash32(F.col("b") + F.lit(2654435769))
    m1 = mul_hash32(F.col("ok").bitwiseXOR(mask))
    x1 = m1.bitwiseXOR(F.shiftright(m1, 16))
    m2 = mul_hash32(x1)
    key = m2.bitwiseXOR(F.shiftright(m2, 16))
    w = (
        F.when(key <= _POIS_KEYS[0], 0)
        .when(key <= _POIS_KEYS[1], 1)
        .when(key <= _POIS_KEYS[2], 2)
        .when(key <= _POIS_KEYS[3], 3)
        .otherwise(4)
    )
    jvm = {
        (r.ok, r.b): r.w
        for r in e.select("ok", "b", w.alias("w")).collect()
    }
    # numpy side: the q290 mapInArrow kernel arithmetic, verbatim
    m32 = np.uint64(0xFFFFFFFF)
    c = np.uint64(2654435761)
    bvals = (np.arange(_BOOT_B, dtype=np.uint64) + np.uint64(2654435769)) & m32
    masks = (bvals * c) & m32
    ok = np.array(keys, dtype=np.uint64) & m32
    for b in range(_BOOT_B):
        x = ok ^ masks[b]
        m1n = (x * c) & m32
        x1n = m1n ^ (m1n >> np.uint64(16))
        m2n = (x1n * c) & m32
        kn = m2n ^ (m2n >> np.uint64(16))
        wn = (kn > np.uint64(_POIS_KEYS[0])).astype(np.int64)
        for t in _POIS_KEYS[1:]:
            wn += kn > np.uint64(t)
        for i, k in enumerate(keys):
            assert int(wn[i]) == jvm[(k, b)], (k, b)
