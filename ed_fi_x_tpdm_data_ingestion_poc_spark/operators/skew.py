"""Skew mitigation: salted joins and two-phase aggregation.

At 100 TB a handful of hot keys (one viral user_id, one default
o_custkey) can pin a single reducer while the rest of the cluster idles.
Two standard remedies, both pure DataFrame:

  * salted_join — append a salt in [0, salt) to the big (skewed) side and
    replicate the small side once per salt value, so one hot key's rows
    spread over `salt` reducers. Result set is IDENTICAL to the unsalted
    join (each big row meets each matching small row exactly once, at its
    own salt).
  * two-phase aggregation — aggregate on (key, salt) first (spreads the
    hot key), then merge partials on key. For algebraic aggregates
    (count/sum/min/max) the result is exact.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin.enabled, on by
default in session.tune) handles sort-merge cases at runtime; salting is
the explicit, planner-independent tool — and the only one available when
the skew is in an aggregation rather than a join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, salt: int) -> DataFrame:
    """Deterministic content-derived salt in [0, salt): safe under task
    retry (rand() is not — a recomputed partition would re-roll rows into
    different salts mid-join)."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )


def replicate_salts(df: DataFrame, salt: int) -> DataFrame:
    """Small side of a salted join: one copy per salt value."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the big side salted and the small side replicated, keyed
    on (on..., salt). Identical result to big.join(small, on, how) for the
    big-side-preserving joins; each hot key now spreads over `salt`
    reducers. The small side grows by `salt`x — keep it the dimension side.

    how is restricted to {'inner', 'left', 'left_semi', 'left_anti'}: a
    small-side-preserving join ('right'/'full') would emit each UNMATCHED
    small row once per salt replica, multiplying it salt-fold. For those,
    swap the sides or fall back to AQE's runtime skew-join split."""
    allowed = {"inner", "left", "left_outer", "left_semi", "semi", "left_anti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join how={how!r} would replicate unmatched small-side "
            f"rows once per salt value; allowed: {sorted(allowed)}"
        )
    b = with_salt(big, salt)
    s = replicate_salts(small, salt)
    return b.join(s, on=[*on, SALT_COL], how=how).drop(SALT_COL)


def salted_count(df: DataFrame, keys: list[str], *, salt: int = 16, out: str = "n") -> DataFrame:
    """Two-phase count: partial on (keys, salt), merge on keys. Exact."""
    return (
        with_salt(df, salt)
        .groupBy(*keys, SALT_COL)
        .agg(F.count(F.lit(1)).alias("__partial"))
        .groupBy(*keys)
        .agg(F.sum("__partial").alias(out))
    )


def salted_sum(
    df: DataFrame, keys: list[str], value: str | Column, *, salt: int = 16, out: str = "s"
) -> DataFrame:
    """Two-phase sum over a skewed key. Exact for algebraic aggregates."""
    v = F.col(value) if isinstance(value, str) else value
    return (
        with_salt(df, salt)
        .groupBy(*keys, SALT_COL)
        .agg(F.sum(v).alias("__partial"))
        .groupBy(*keys)
        .agg(F.sum("__partial").alias(out))
    )
