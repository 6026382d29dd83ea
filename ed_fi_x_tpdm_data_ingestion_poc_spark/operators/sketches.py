"""Mergeable-sketch operators: HLL sketch tables/rollups and a portable
Bloom filter with JVM-side probes.

The 100 TB pattern both implement: scan the corpus ONCE into a fixed-size
summary (KBs per group), persist it, and answer later questions by MERGING
or PROBING the summary — never by re-scanning the corpus.

* HLL sketch table: per-group ``hll_sketch_agg`` binaries (Spark's
  HllSketch, Apache DataSketches). A nightly job materializes sketches at
  the finest grain; any coarser rollup is ``hll_union_agg`` over the
  sketch table — bytes in, bytes out, no base-table scan. Map-side partial
  aggregation means the shuffle moves one ~2^lgk-byte buffer per group per
  partition, not the raw keys.

* Bloom membership: Spark 4 does not expose ``bloom_filter_agg`` in the
  SQL registry (it is an internal runtime-filter expression), so this is a
  from-scratch split-Bloom-filter: bits are built driver-side from the
  (small, broadcastable — same assumption q75's decontamination join
  makes) reference set's xxhash64 values, embedded as an array<bigint>
  literal, and PROBED with pure JVM expressions (double hashing
  ``g_i = h1 + i*h2 mod m``, shiftright/& bit tests). The probe is
  map-only: no join, no shuffle, no Python — strictly cheaper than the
  broadcast-join decontamination path when only the verdict (keep/drop)
  is needed. False negatives are impossible by construction (a LAW the
  tests pin); false-positive rate is the classic (1-e^{-kn/m})^k.

No analog in the reference (SisConnectorService.java synchronizes
documents row-at-a-time and keeps exact HashMaps); brief-mandated
beyond-reference surface.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# HLL sketch tables


def hll_sketch_table(
    df: DataFrame, group_cols: list[str], col: str, lgk: int = 12
) -> DataFrame:
    """Materialize the finest-grain distinct-count sketch table:
    one linear scan, one shuffle on ``group_cols`` (map-side partials),
    one ~2^lgk-byte binary per group in column ``<col>_hll``."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(col, F.lit(lgk)).alias(f"{col}_hll")
    )


def hll_rollup(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str,
    out: str = "distinct_est",
) -> DataFrame:
    """Roll a sketch table up to a coarser grain by MERGING sketches —
    the base table is never touched. Union is lossless over the sketched
    SET (no re-scan error accrues), though the merged estimate can differ
    from a direct coarse-grain ``hll_sketch_agg`` by well under the
    sketch's error bound (union may switch internal representation)."""
    est = F.hll_sketch_estimate(F.hll_union_agg(sketch_col))
    if not group_cols:
        return sketches.agg(est.alias(out))
    return sketches.groupBy(*group_cols).agg(est.alias(out))


# ---------------------------------------------------------------------------
# Portable Bloom filter (JVM probe)

_MASK64 = (1 << 64) - 1


def bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k_hashes) for ``n_items`` at target ``fpp``. m is rounded
    UP to a power of two: with m | 2^64, the probe's signed ``pmod`` and
    the build's uint64 ``%`` reduce the same two's-complement bit pattern
    to the same index — the power-of-two is what makes the JVM/numpy hash
    arithmetic agree, not just an addressing trick. Rounding up only
    lowers the realized fpp."""
    n = max(1, n_items)
    m_opt = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m = 1 << (m_opt - 1).bit_length()
    # k from the TARGET fpp, not from the rounded-up m: recomputing
    # k = m/n ln2 after the power-of-two round-up inflates the probe count
    # (and probe cost is k JVM expressions per row) for a marginal fpp
    # gain; k = -log2(fpp) hits the target and the larger m only helps.
    k = max(1, round(-math.log2(fpp)))
    return m, k


def _bigint_array_lit(values: list[int]) -> Column:
    """array<bigint> literal via ONE SQL text expression. F.lit on a
    Python list round-trips every element through py4j (~1 s per 2048
    elements, paid at EXPRESSION BUILD time on every query build); a
    single parsed string is ~400x faster and yields the identical
    literal. Matters for cms_point (d arrays of w counts) and the bloom
    probe (m/64 words)."""
    return F.expr(
        "CAST(array(" + ",".join(map(str, values)) + ") AS array<bigint>)"
    )


def _probe_hashes(col: Column) -> tuple[Column, Column]:
    """The (h1, h2) double-hash pair for double hashing. Seeds differ by
    hashing the value alone vs. with a salt literal; both are plain JVM
    xxhash64 so build and probe agree bit-for-bit."""
    return F.xxhash64(col), F.xxhash64(col, F.lit("bloom-h2"))


def build_bloom(
    values_df: DataFrame,
    col: str,
    fpp: float = 0.01,
    params: tuple[int, int] | None = None,
    k_cap: int | None = None,
) -> dict:
    """Build the bit array driver-side from a SMALL reference set (eval
    benchmarks, blocklists — broadcast-sized by definition). Hashing runs
    distributed in the JVM; only the (h1, h2) pairs are collected. Returns
    {"words": list[int] signed 64-bit, "m": bits, "k": probes, "n": items}.

    Sizing guard: at fpp=1e-2 the literal is ~1.2 KiB per 1k items; a 1M-item
    reference set (~1.2 MiB plan literal) is still fine, far beyond any eval
    benchmark. Corpus-sized sets belong in dedup/LSH, not a driver bloom.
    """
    h1c, h2c = _probe_hashes(F.col(col))
    pairs = (
        values_df.select(F.col(col))
        .where(F.col(col).isNotNull())
        .distinct()
        .select(h1c.alias("h1"), h2c.alias("h2"))
        .collect()
    )
    # explicit (m, k) lets cooperating builders size every bloom for the
    # EVENTUAL union (bloom_union requires identical params)
    if params is not None:
        m, k = params
        # the probe's pmod(signed, m) == build's uint64 % m equivalence
        # holds ONLY for power-of-two m (m | 2^64); and words sizing
        # needs 64 | m — reject sizes that would silently break the
        # no-false-negative law or under-allocate the bit array
        if m < 64 or (m & (m - 1)) != 0:
            raise ValueError(
                f"bloom m must be a power of two >= 64, got {m}"
            )
        if k < 1:
            raise ValueError(f"bloom k must be >= 1, got {k}")
    else:
        m, k = bloom_params(len(pairs), fpp)
    if k_cap is not None:
        # probe cost is k bit tests per row; when an EXACT join/check runs
        # after the prune (q137's shape), false positives cannot leak and
        # a small k with the power-of-two-rounded m keeps realized fpp in
        # the few-percent range at a fraction of the probe cost
        if k_cap < 1:
            raise ValueError(f"bloom k_cap must be >= 1, got {k_cap}")
        k = min(k, k_cap)
    words = [0] * (m // 64)
    for r in pairs:
        # reduce mod m BEFORE combining: with m a power of two the
        # double-hash index (h1 + i*h2) mod m equals
        # (h1 mod m + i*(h2 mod m)) mod m, and the reduced form stays
        # below ~k*m — no 64-bit wraparound, so the JVM probe can run
        # the identical arithmetic under ANSI overflow checking
        h1m, h2m = (r.h1 & _MASK64) % m, (r.h2 & _MASK64) % m
        for i in range(k):
            idx = (h1m + i * h2m) % m
            words[idx >> 6] |= 1 << (idx & 63)
    # two's-complement to signed for the array<bigint> literal
    signed = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    return {"words": signed, "m": m, "k": k, "n": len(pairs)}


def bloom_might_contain(bloom: dict, col: Column) -> Column:
    """Pure-JVM membership probe: k double-hash bit tests against the
    array<bigint> literal. Map-only — composes into any filter/select
    without a join or shuffle. No false negatives, ~fpp false positives.

    The mod arithmetic matches the build exactly: JVM signed-long
    add/multiply wraps to the same bit pattern as the build's uint64 wrap,
    and because m is a power of two (m | 2^64), ``pmod(signed, m)`` and
    the build's ``uint64 % m`` select the same low bits.

    Cost model (measured, 600k rows, sf0.1): the conjunction is SPLIT
    into k predicates by FilterExec and each re-derives the hash pair,
    so probe cost is linear in k (~0.17 s per test). Sharing the pair
    through a one-element array<struct> + ``forall`` fold was tried and
    is SLOWER at every k (the interpreted higher-order-function path
    costs more than the redundant hashes: 0.70 vs 0.35 s at k=2, 1.65
    vs 1.2 s at k=7) — so the probe stays an unrolled AND chain and the
    real lever is k itself: when an exact join/check follows the prune,
    build the bloom with ``k_cap=2`` (false positives cannot leak)."""
    words = _bigint_array_lit(bloom["words"])
    m, k = bloom["m"], bloom["k"]
    h1, h2 = _probe_hashes(col)
    # reduced double hashing (see build_bloom): pmod(signed, m) selects the
    # same low bits as the build's uint64 % m because m | 2^64, and the
    # combined value stays < k*m — ANSI-safe, no overflow
    h1m = F.pmod(h1, F.lit(m).cast("bigint"))
    h2m = F.pmod(h2, F.lit(m).cast("bigint"))
    cond = F.lit(True)
    for i in range(k):
        idx = F.pmod(h1m + F.lit(i) * h2m, F.lit(m).cast("bigint"))
        word = F.element_at(words, (idx / 64).cast("int") + 1)
        # getbit, not shiftright: PySpark's shiftright only takes a Python
        # int shift amount; getbit takes a Column position (range [0,64)
        # on a bigint operand, sign bit included)
        cond = cond & (F.getbit(word, F.pmod(idx, F.lit(64))) == 1)
    return cond


def bloom_union(a: dict, b: dict) -> dict:
    """OR-merge two blooms built with identical (m, k): membership in
    EITHER set — the mergeable-summary property that lets each corpus
    partition (or each new eval benchmark) build its own bloom and a
    reduce step combine them without touching raw data. False-negative
    impossibility is preserved; fpp degrades gracefully with fill.
    To plan for growth, build every bloom with bloom_params sized for the
    eventual union (m depends only on n and fpp, not on the values)."""
    if (a["m"], a["k"]) != (b["m"], b["k"]):
        raise ValueError(
            f"bloom_union needs identical (m,k): {(a['m'], a['k'])} vs "
            f"{(b['m'], b['k'])}"
        )
    words = [x | y for x, y in zip(a["words"], b["words"])]
    # re-sign: Python's | on negatives stays in int range already signed
    return {"words": words, "m": a["m"], "k": a["k"], "n": a["n"] + b["n"]}


def cms_build(
    values_df: DataFrame,
    col: str,
    *,
    weight: Column | None = None,
    d: int = 4,
    w: int = 2048,
) -> dict:
    """Count-min sketch over a column: {"tables": d lists of w counts,
    "d", "w", "n"} — the mergeable FREQUENCY summary next to HLL
    (distincts) and Bloom (membership). Build is one distributed
    map-side-combined aggregation: each row explodes to d (depth, slot)
    cells (slot = pmod(xxhash64(v, depth), w) — ANSI-safe like the bloom
    path) and the groupBy reduces the corpus to at most d*w cells before
    the driver sees anything; the collected summary is d*w longs
    (d=4, w=2048 -> 64 KiB), independent of corpus size.

    Weights must be NON-NEGATIVE: cms_point's never-underestimates law
    and the Cormode-Muthukrishnan error bound both assume it (a negative
    weight lets an unrelated value's cell dip below a value's true
    count). Enforced at build time via a min(wt) rider on the same
    aggregation — no extra job."""
    if d < 1 or w < 1:
        raise ValueError(f"cms needs d >= 1 and w >= 1, got d={d} w={w}")
    wt = (weight if weight is not None else F.lit(1)).cast("long")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("depth"),
                F.pmod(F.xxhash64(F.col("v"), F.lit(i)), F.lit(w))
                .cast("int")
                .alias("slot"),
            )
            for i in range(d)
        ]
    )
    agg = (
        values_df.select(F.col(col).alias("v"), wt.alias("wt"))
        .where(F.col("v").isNotNull())
        .select(F.explode(cells).alias("h"), "wt")
        .groupBy("h.depth", "h.slot")
        .agg(F.sum("wt").alias("c"), F.min("wt").alias("mn"))
        .collect()
    )
    if agg and min(r.mn for r in agg) < 0:
        raise ValueError(
            "cms_build requires non-negative weights: cms_point's "
            "never-underestimates law does not hold for signed updates"
        )
    tables = [[0] * w for _ in range(d)]
    for r in agg:
        tables[r.depth][r.slot] = r.c
    return {"tables": tables, "d": d, "w": w, "n": sum(tables[0])}


def cms_point(cms: dict, col: Column) -> Column:
    """Pure-JVM point-frequency estimate: min over depths of the
    depth-table literal at this value's slot — map-only, composes into
    any select/filter with no join or shuffle (same contract as
    bloom_might_contain). Never underestimates (a law: every cell the
    value hashes to counted ALL of its occurrences); overestimates by
    at most e*n/w with high probability (Cormode & Muthukrishnan
    2005)."""
    d, w = cms["d"], cms["w"]
    ests = [
        F.element_at(
            _bigint_array_lit(cms["tables"][i]),
            (F.pmod(F.xxhash64(col, F.lit(i)), F.lit(w)) + 1).cast("int"),
        )
        for i in range(d)
    ]
    return F.least(*ests) if len(ests) > 1 else ests[0]


def kmv_build(values_df: DataFrame, col: str, k: int = 1024) -> dict:
    """K-minimum-values (theta-style) distinct sketch: the k smallest
    xxhash64 values of the column's DISTINCT set. Returns
    {"mins": sorted signed-64 hashes, "k": k}.

    Build is one distributed job that never moves more than k rows to the
    driver: hash (map-only, JVM) -> distinct (one shuffle on the hash) ->
    ``orderBy(h).limit(k)`` which Spark executes as TakeOrderedAndProject —
    per-partition top-k heaps, then a k-row driver merge. The summary is
    8k bytes regardless of corpus size.

    Why next to HLL (hll_sketch_table): HLL's inclusion-exclusion
    intersection (q105) degrades as |A∩B| shrinks relative to |A∪B|
    because it SUBTRACTS three noisy estimates; KMV intersects the
    retained SAMPLES, so tiny intersections stay estimable — the
    theta/KMV boundary q105's docstring records, now closed.

    Exactness law: if fewer than k distinct values exist, the sketch IS
    the distinct hash set and every estimate derived from it is exact.
    """
    if k < 2:
        raise ValueError(f"kmv needs k >= 2 (estimator divides by u_(k)), got {k}")
    rows = (
        values_df.select(F.xxhash64(F.col(col)).alias("h"))
        .where(F.col(col).isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
        .collect()
    )
    return {"mins": [r.h for r in rows], "k": k}


def _kmv_u(h: int) -> float:
    """Map a signed-64 hash to (0, 1]: the SIGNED order is the uniform
    order shifted by 2^63, so rank statistics carry over unchanged."""
    return (h + (1 << 63) + 1) / float(1 << 64)


def kmv_estimate(kmv: dict) -> float:
    """Distinct-count estimate: exact len(mins) when the sketch saw fewer
    than k distincts, else the Beyer et al. (2007) unbiased estimator
    (k-1)/u_(k) with u_(k) the k-th smallest hash as a (0,1] uniform."""
    mins, k = kmv["mins"], kmv["k"]
    if len(mins) < k:
        return float(len(mins))
    return (k - 1) / _kmv_u(mins[-1])


def kmv_merge(a: dict, b: dict) -> dict:
    """Union sketch: k smallest of the merged min-sets. EXACTLY equals
    kmv_build on the unioned input (a law the tests pin): the k smallest
    of A∪B are each among the k smallest of A or of B, so retaining k
    per side loses nothing. Mergeable-summary contract as bloom_union/
    cms_merge: partitions/days sketch independently, reduce combines."""
    if a["k"] != b["k"]:
        raise ValueError(f"kmv_merge needs identical k: {a['k']} vs {b['k']}")
    mins = sorted(set(a["mins"]) | set(b["mins"]))[: a["k"]]
    return {"mins": mins, "k": a["k"]}


def kmv_intersect_estimate(a: dict, b: dict) -> float:
    """|A∩B| from two KMV summaries alone (no re-scan, no join):
    the k smallest of A∪B are a uniform sample of the union, so the
    fraction of them present in BOTH min-sets estimates Jaccard(A,B);
    scale by the union estimate (Beyer et al. 2007). Exact when both
    sketches are exact. Unlike HLL inclusion-exclusion the error is
    relative to the UNION sample, not the sum of three set estimates —
    tiny intersections of large sets stay estimable."""
    u = kmv_merge(a, b)
    sa, sb = set(a["mins"]), set(b["mins"])
    both = sum(1 for h in u["mins"] if h in sa and h in sb)
    if len(u["mins"]) < u["k"]:
        return float(both)  # union exact -> intersection exact
    jaccard = both / len(u["mins"])
    return jaccard * kmv_estimate(u)


def cms_merge(a: dict, b: dict) -> dict:
    """Cell-wise sum of two sketches built with identical (d, w):
    frequencies over the UNION of the inputs — partitions/days sketch
    independently, a reduce step combines, raw data is never re-read
    (the same mergeable-summary contract as bloom_union/hll_union)."""
    if (a["d"], a["w"]) != (b["d"], b["w"]):
        raise ValueError(
            f"cms_merge needs identical (d,w): {(a['d'], a['w'])} vs "
            f"{(b['d'], b['w'])}"
        )
    tables = [
        [x + y for x, y in zip(ta, tb)]
        for ta, tb in zip(a["tables"], b["tables"])
    ]
    return {"tables": tables, "d": a["d"], "w": a["w"], "n": a["n"] + b["n"]}


def cms_inner_product(a: dict, b: dict) -> int:
    """Join-size / inner-product estimate from two count-min sketches
    built with identical (d, w) over the two join columns:
    min over depths of sum_j a[i][j] * b[i][j] (the AMS-style
    estimator specialised to CMS, Cormode & Muthukrishnan 2005 §4.2).

    Estimates sum_v f_a(v) * f_b(v) — the row count of the equi-join
    A.key = B.key — without touching either table again. Never
    underestimates (every colliding pair only ADDS to a cell product);
    overestimates by at most e * n_a * n_b / w with probability
    1 - (1/e)^d. With a == b this is the self-join size / second
    frequency moment F2, the skew statistic that decides whether a key
    needs salting BEFORE the shuffle runs.

    This is the planning use of the sketches: both sides' summaries are
    d*w longs built in one map-side-combined pass each (cms_build), so
    a 100 TB optimizer can estimate every candidate join's output
    cardinality from 64 KiB per table."""
    if (a["d"], a["w"]) != (b["d"], b["w"]):
        raise ValueError(
            f"cms_inner_product needs identical (d,w): "
            f"{(a['d'], a['w'])} vs {(b['d'], b['w'])}"
        )
    return min(
        sum(x * y for x, y in zip(ta, tb))
        for ta, tb in zip(a["tables"], b["tables"])
    )


# ---------------------------------------------------------------------------
# Misra-Gries / SpaceSaving heavy-hitter summary


def _mg_compress(counts: dict, k: int) -> tuple[dict, int]:
    """Reduce a {item: count} map to at most k counters by subtracting
    the (k+1)-th largest count from every counter and dropping the
    non-positives (the Misra-Gries decrement, applied in bulk). Returns
    (compressed, subtracted). Every surviving estimate drops by at most
    `subtracted`, and because k+1 items each held >= subtracted
    occurrences, subtracted <= n/(k+1)."""
    if len(counts) <= k:
        return dict(counts), 0
    cut = sorted(counts.values(), reverse=True)[k]
    return {i: c - cut for i, c in counts.items() if c > cut}, cut


def mg_build(df: DataFrame, col: str, k: int = 256) -> dict:
    """One distributed pass -> {"counters": {item: est}, "n": total
    non-null rows, "err": worst-case undercount}. The Misra-Gries
    guarantee (Misra & Gries 1982; merge rule per Agarwal et al. 2013,
    "Mergeable Summaries"): for EVERY item, est <= true and
    true - est <= err — so every item with true > err is guaranteed
    present (no false negatives among the real heavy hitters), and err
    <= 2n/(k+1) by construction (<= n/(k+1) from the per-batch cuts
    plus <= n/(k+1) from the final driver compress).

    Each Arrow batch counts ITS OWN rows exactly (a batch is bounded)
    and compresses to k counters; the driver sums the per-batch
    summaries pointwise — absent items are exact zeros within that
    batch's cut — and compresses once more. Driver holds
    n_batches * k counter rows, never the corpus. Same artifact
    contract as the CMS/KMV/HLL sketches: shards build independently,
    mg_merge combines."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def gen(it):
        import pandas as pd

        for pdf in it:
            s = pdf[col].dropna().astype(str)
            n = len(s)
            if not n:
                continue
            vc = s.value_counts()
            comp, cut = _mg_compress(
                {i: int(c) for i, c in vc.items()}, k
            )
            # one NULL-item bookkeeping row per batch carries (cut, nb)
            # even when the compress empties the counter set (possible
            # when the k+1 largest batch counts are all equal)
            items = list(comp) + [None]
            out = pd.DataFrame(
                {
                    "item": items,
                    "c": [comp[i] for i in comp] + [0],
                    "cut": [0] * len(comp) + [cut],
                    "nb": [0] * len(comp) + [n],
                }
            )
            yield out

    rows = (
        df.select(F.col(col).cast("string").alias(col))
        .where(F.col(col).isNotNull())
        .mapInPandas(gen, "item string, c long, cut long, nb long")
        .collect()
    )
    merged: dict[str, int] = {}
    err = 0
    n = 0
    for r in rows:
        if r.item is not None:
            merged[r.item] = merged.get(r.item, 0) + r.c
        err += r.cut
        n += r.nb
    counters, cut = _mg_compress(merged, k)
    return {"counters": counters, "n": n, "err": err + cut, "k": k}


def mg_merge(a: dict, b: dict) -> dict:
    """Combine two summaries built over DISJOINT row sets: pointwise
    counter add (an item absent from one side is an exact zero within
    that side's err), then one compress back to k. Errors add, plus the
    compress cut — the mergeable-summary contract (Agarwal et al.
    2013), which CMS/KMV/HLL here share and Spark's own approx
    count-min/GK state does not expose."""
    if a["k"] != b["k"]:
        raise ValueError(f"mg_merge needs identical k: {a['k']} vs {b['k']}")
    merged = dict(a["counters"])
    for i, c in b["counters"].items():
        merged[i] = merged.get(i, 0) + c
    counters, cut = _mg_compress(merged, a["k"])
    return {
        "counters": counters,
        "n": a["n"] + b["n"],
        "err": a["err"] + b["err"] + cut,
        "k": a["k"],
    }
