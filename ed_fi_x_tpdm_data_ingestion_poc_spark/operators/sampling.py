"""Sampling operators for training-data pipelines: deterministic hash
sampling (shuffle-free scale path), exact stratified sampling, and
per-stratum caps.

Scale design:
  * hash_sample is a pure FILTER — no shuffle, no state, reproducible
    across runs and engines, composable with any downstream op. This is
    the 100 TB default: rate control by hash threshold, never by
    `rand()` (non-deterministic re-execution under task retry changes
    the sample!).
  * stratified_sample_exact / cap_per_stratum use one window shuffle on
    the strata key to get EXACT per-stratum counts — the right tool when
    the contract is "exactly ceil(f*n) per language", e.g. balancing a
    fine-tuning mix. Ordering inside a stratum is by md5(id): decoupled
    from ingestion order, stable across engines (used by the DuckDB
    oracle twins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_bucket(id_col: Column | str, buckets: int = 1_000_000, seed: int = 0) -> Column:
    """Deterministic bucket in [0, buckets) from xxhash64(id, seed)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(buckets))


def hash_sample(
    df: DataFrame,
    fraction: float,
    *,
    id_col: str,
    seed: int = 0,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Deterministic ~fraction sample as a shuffle-free filter:
    keep rows with hash_bucket(id) < fraction * buckets.

    Statistically exact rate in expectation (xxhash64 is uniform);
    deterministic per id, so re-runs, retried tasks, and incremental
    appends sample consistently — the property rand()-based sampling
    loses. Fully pushed into the scan stage (no exchange)."""
    return df.filter(hash_bucket(id_col, buckets, seed) < int(fraction * buckets))


def _stratum_order_key(id_col: str, order: str, salt: int) -> Column:
    """The deterministic engine-portable within-stratum ordering both
    stratified samplers share: "md5" (string hash; DuckDB twin is
    md5(CAST(id AS VARCHAR)), pinned by qz66's oracle) or "mul" (the
    overflow-safe mul_hash32 on id+salt — the numeric portable hash
    every other sampling site uses, DuckDB twin mul_hash32_sql)."""
    if order == "md5":
        return F.md5(F.col(id_col).cast("string"))
    if order == "mul":
        return mul_hash32(F.col(id_col) + F.lit(salt))
    raise ValueError(f"unknown order {order!r} (md5|mul)")


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: list[str],
    fraction: float,
    *,
    id_col: str,
    order: str = "md5",
    salt: int = 0,
    flag_col: str | None = None,
) -> DataFrame:
    """EXACT stratified sample: ceil(fraction * n_s) rows from each stratum
    s, chosen deterministically by hash(id) order (engine-independent;
    see _stratum_order_key for the two portable orders).

    One shuffle on the strata key (two window functions share it). Skewed
    strata are fine — the window is a streaming rank, not a collect.
    With `flag_col`, every row is returned carrying an int membership
    flag instead of filtering — the audit-table shape (q135)."""
    order_key = _stratum_order_key(id_col, order, salt)
    w = Window.partitionBy(*strata_cols).orderBy(order_key, F.col(id_col))
    wc = Window.partitionBy(*strata_cols)
    keep = F.row_number().over(w) <= F.ceil(
        F.count(F.lit(1)).over(wc) * F.lit(fraction)
    )
    if flag_col is not None:
        return df.withColumn(flag_col, keep.cast("int"))
    return (
        df.withColumn("__keep", keep.cast("int"))
        .filter(F.col("__keep") == 1)
        .drop("__keep")
    )


def cap_per_stratum(
    df: DataFrame,
    strata_cols: list[str],
    max_rows: int,
    *,
    id_col: str,
) -> DataFrame:
    """At most max_rows per stratum, deterministic md5(id) order — the
    "no language dominates the mix" cap. Same single-shuffle shape as
    stratified_sample_exact."""
    order_key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*strata_cols).orderBy(order_key, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_rows)
        .drop("__rn")
    )


def mul_hash32(col: Column) -> Column:
    """(col * 2654435761) mod 2^32, exact for ANY bigint input under
    ANSI mode — THE canonical implementation; every multiplicative-hash
    call site (shard assignment, Bernoulli sampling, reservoir keys, and
    their DuckDB oracle twins via mul_hash32_sql) routes through here so
    the arithmetic can never drift between sites. The naive product
    overflows signed 64-bit once the operand exceeds ~3.47e9 (throws
    under ANSI; silently diverges from the oracle's 128-bit arithmetic
    otherwise), so: reduce to 32 bits, split into 16-bit halves,
    recombine mod 2^32 — every intermediate stays below 2^48.
    Value-identical to the naive form where that form is defined."""
    c, m32 = 2654435761, 4294967296
    d = F.pmod(col.cast("bigint"), F.lit(m32))
    lo, hi = d.bitwiseAND(F.lit(65535)), F.shiftright(d, 16)
    return F.pmod(
        F.pmod(lo * F.lit(c), F.lit(m32))
        + F.pmod(F.pmod(hi * F.lit(c), F.lit(m32)) * F.lit(65536), F.lit(m32)),
        F.lit(m32),
    )


def mul_hash32_sql(expr: str) -> str:
    """ANSI-SQL twin of mul_hash32 for DuckDB oracle strings: the same
    pmod + 16-bit-half split multiply, so engine and oracle agree for
    EVERY bigint input (not just ids small enough that the naive 64-bit
    product happens not to overflow). `//` is DuckDB integer division;
    d is non-negative after the pmod, so floor == truncate."""
    d = f"((({expr}) % 4294967296 + 4294967296) % 4294967296)"
    return (
        f"((({d} % 65536) * 2654435761) % 4294967296"
        f" + ((({d} // 65536) * 2654435761 % 4294967296) * 65536)"
        f" % 4294967296) % 4294967296"
    )


def portable_uniform01(id_col: Column | str, salt: int = 0) -> Column:
    """Deterministic engine-portable uniform in (0, 1): the overflow-safe
    Knuth multiplicative hash (mul_hash32, shared with the shard/sample
    call sites in queries/curation_q.py) shifted by +0.5 so the value is
    never exactly 0 — safe under ln(). Identical BIGINT+double arithmetic
    is expressible in DuckDB SQL (mul_hash32_sql), which is what makes
    samples drawn from it hash-checkable cross-engine (unlike xxhash64)."""
    col = (F.col(id_col) if isinstance(id_col, str) else id_col).cast("bigint")
    h = mul_hash32(col + F.lit(salt))
    return (h + F.lit(0.5)) / F.lit(4294967296.0)


def weighted_reservoir_exact(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Exactly-k weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, A-ES): each row draws key = ln(u) / w for a
    per-row deterministic uniform u and positive weight w; the k largest
    keys are a weighted reservoir — inclusion probability proportional
    to weight, no replacement, single pass. Plan: a global
    orderBy+limit, which Spark executes as TakeOrdered (per-partition
    top-k then a k-row driver merge — no full sort, no shuffle of the
    corpus; the 100 TB shape). Keys are ROUNDed to 9 dp with an id
    tiebreak so the selected SET is stable cross-engine."""
    key = F.round(
        F.log(portable_uniform01(id_col, salt)) / F.col(weight_col), 9
    )
    return (
        df.withColumn("__wr_key", key)
        .orderBy(F.col("__wr_key").desc(), F.col(id_col))
        .limit(k)
        .drop("__wr_key")
    )


def _epoch_mask(epoch: int) -> int:
    """Python-side (epoch is a scalar parameter) 32-bit xor mask for the
    epoch shuffle: one Knuth multiplicative step over epoch + the golden
    ratio offset. Computed identically when embedding into the DuckDB
    oracle string, so the two engines share the constant by value."""
    return ((epoch + 0x9E3779B9) * 2654435761) % 4294967296


def epoch_order_key(id_col: Column | str, epoch: int) -> Column:
    """Engine-portable per-epoch shuffle key: TWO multiply+xorshift
    rounds over the xor-masked id —

        m1 = mul_hash32(id xor mask(epoch));  x1 = m1 xor (m1 >> 16)
        m2 = mul_hash32(x1);                  key = m2 xor (m2 >> 16)

    Both pieces are load-bearing. (a) The xor MASK, not an additive
    salt: mul_hash32 is linear (h(x+d) = h(x) + c*d mod 2^32), so
    h(id + epoch) makes consecutive epochs differ by a CONSTANT — a
    circular rotation of the same order, measured Spearman rho ~ -0.42
    between epochs 0 and 1. (b) The SECOND round: on sequential ids
    (the real id distribution — xor with the mask then only perturbs
    the mask's low bits, leaving shared high-bit structure across
    masks) one round still measured rho up to 0.23 between epochs 1
    and 2 in-engine; the second multiply diffuses the low bits through
    the full word, measured worst |rho| = 0.03 over ALL epoch pairs in
    0..11 on 6k sequential ids (law-tested in tests/test_sampling.py).
    Every operand stays non-negative and below 2^32, so Spark bigint
    and DuckDB BIGINT agree bit-for-bit (epoch_order_key_sql is the
    oracle twin)."""
    col = (F.col(id_col) if isinstance(id_col, str) else id_col).cast(
        "bigint"
    )
    m1 = mul_hash32(col.bitwiseXOR(F.lit(_epoch_mask(epoch))))
    x1 = m1.bitwiseXOR(F.shiftright(m1, 16))
    m2 = mul_hash32(x1)
    return m2.bitwiseXOR(F.shiftright(m2, 16))


def epoch_order_key_sql(expr: str, epoch: int) -> str:
    """DuckDB twin of epoch_order_key — same mask, same split-multiply
    hash (mul_hash32_sql), same two xorshift rounds. Intermediate
    values are inlined (oracle strings have no lets), so the expression
    is long but value-identical; xor() and >> on non-negative BIGINT
    match Spark's bitwiseXOR/shiftright exactly."""
    m1 = mul_hash32_sql(f"xor(CAST({expr} AS BIGINT), {_epoch_mask(epoch)})")
    x1 = f"xor({m1}, ({m1}) >> 16)"
    m2 = mul_hash32_sql(x1)
    return f"xor({m2}, ({m2}) >> 16)"


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    epoch: int = 0,
    shards: int = 16,
    n_partitions: int | None = None,
) -> DataFrame:
    """Epoch-seeded deterministic corpus shuffle — the per-epoch order
    randomization a training-data export needs on top of the stable
    shard ASSIGNMENT of qz91/qz154 (assignment fixes which shard a doc
    lives in; nothing there randomizes within-shard ORDER per epoch,
    and feeding a model the same document order every epoch correlates
    gradient noise across epochs).

    Contract: output carries `shard` (epoch-INDEPENDENT — qz91's
    mul_hash32(id) pmod shards, so membership never churns between
    epochs and shard-local state like tokenizer caches stays valid) and
    `epoch_key` (epoch_order_key). Rows are range-partitioned on
    (shard, epoch_key, id) and sorted within partitions, so the
    concatenation of output partitions IS the epoch order; a writer
    lands it with write.partitionBy('shard') and readers stream files
    in name order. Laws (tests/test_sampling.py): exact permutation
    (multiset-equal to input), same-epoch reproducibility (identical
    order across builds), cross-epoch decorrelation (|Spearman rho|
    bound), engine portability (q287's hash-checked oracle).

    Scale: n_partitions decouples sort-task size from shard count —
    at 100 TB / 16 shards a shard is ~6 TB, far beyond one sort task,
    so repartitionByRange splits each shard's order across many
    contiguous tasks (range exchange + local sort, no global sort, no
    driver state). Reproducible is the ORDER, not the file SPLIT
    POINTS: range bounds come from sampling, so a re-run may cut files
    at different offsets while reading back in partition order yields
    the identical sequence. Measured (tools/scale_probe.py
    epoch_shuffle, sf0.1 documents, 10x disjoint ids): 0.76 -> 0.76 s,
    0.10x the linear law — the scheduler floor dominates at this size;
    the range exchange is the only data-proportional cost."""
    key = epoch_order_key(id_col, epoch)
    shard = F.pmod(mul_hash32(F.col(id_col)), F.lit(shards))
    out = df.withColumn("shard", shard).withColumn("epoch_key", key)
    n = n_partitions if n_partitions is not None else shards
    return out.repartitionByRange(
        n, "shard", "epoch_key", F.col(id_col)
    ).sortWithinPartitions("shard", "epoch_key", id_col)


def kfold_assign(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str = "doc_id",
    order: str = "md5",
    salt: int = 0,
) -> DataFrame:
    """Deterministic STRATIFIED k-fold assignment — the cross-validation
    primitive qz119/qz120's single train/eval splits don't provide:
    every row lands in exactly one of k folds, and within every stratum
    the fold sizes are exactly balanced (they differ by at most one),
    so each CV iteration trains and tests on the same stratum mix.
    fold = (rank_within_stratum - 1) % k over the engine-portable
    within-stratum order (_stratum_order_key: md5 or salted mul_hash32
    — decoupled from ingestion order, reproducible across runs AND
    engines; a plain hash-mod fold would be shuffle-free but only
    balanced in expectation, which at small strata skews per-fold class
    mixes). Adds a `fold` int column.

    Scale: one window shuffle on the strata key — the same plan class
    as stratified_sample_exact; the sort key is (hash, id) so ties are
    total. At 100 TB with few huge strata, rank via
    operators/ranking.py::global_ranks per stratum is the escape hatch
    (range exchange instead of one partition per stratum)."""
    rn = F.row_number().over(
        Window.partitionBy(*strata_cols).orderBy(
            _stratum_order_key(id_col, order, salt), F.col(id_col)
        )
    )
    return df.withColumn("fold", ((rn - 1) % k).cast("int"))


def zorder_key(x_col: Column | str, y_col: Column | str,
               bits: int = 16) -> Column:
    """Z-order (Morton) key of two non-negative integer dimensions: the
    bit-interleave z = sum_i ((x>>i)&1)<<2i | ((y>>i)&1)<<(2i+1) — the
    space-filling-curve layout key behind multi-dimensional data
    skipping in lakehouse tables (Delta/Iceberg OPTIMIZE ZORDER):
    sorting files by z clusters BOTH dimensions at once, so min/max
    file statistics prune selective predicates on either column, where
    a lexicographic sort only ever prunes its leading column. Pure
    integer JVM expressions (2*bits shift/mask terms, no UDF), exact
    and engine-portable (zorder_key_sql is the DuckDB twin); inputs
    are truncated to `bits` low bits — callers quantize wider domains
    first (the locality law only needs rank-preserving buckets)."""
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("bigint")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(
            F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


def zorder_key_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """DuckDB twin of zorder_key — the identical interleave generated
    from the same loop, so the arithmetic cannot drift."""
    terms = []
    for i in range(bits):
        terms.append(f"(((({x_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y_expr}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
