"""Declarative data-quality expectation checks.

An ingestion engine that moves data it never validates ships garbage
silently — the reference does exactly that (its only "validation" is the
REST API rejecting a document; SisConnectorService.java logs and moves
on). This operator evaluates a rule set over a table and emits one row
per rule: (rule, n_checked, n_violations, ok) — the contract tables
(Great-Expectations-style) a pipeline gates deploys on.

Scale shape: every row-predicate rule folds into ONE aggregate over ONE
scan (count + conditional sums side by side — no per-rule pass, no
shuffle beyond the single partial-agg exchange); uniqueness folds into
the same pass as count(col) - count_distinct(col). Referential-integrity
rules are each one anti-join whose parent key side is dimension-sized
(broadcast); the fact side never reshuffles.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation. Exactly one of the three payloads is set:
    * violation: boolean Column — rows where it's true FAIL the rule
    * unique_col: column name that must be unique (non-null occurrences)
    * fk: (parent_df, child_key, parent_key) — child rows whose non-null
      key has no parent row FAIL
    """

    name: str
    violation: Column | None = None
    unique_col: str | None = None
    fk: tuple[DataFrame, str, str] | None = None


def check_rules(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate all rules; returns (rule, n_checked, n_violations, ok)
    with ok = 1 iff n_violations == 0. Deterministic row set (one row per
    rule), order-insensitive."""
    if not rules:
        raise ValueError("rules must be non-empty")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("duplicate rule names")

    agg_rules = [r for r in rules if r.fk is None]
    fk_rules = [r for r in rules if r.fk is not None]
    parts: list[DataFrame] = []

    if agg_rules:
        aggs = [F.count(F.lit(1)).alias("__n__")]
        for r in agg_rules:
            if r.violation is not None:
                aggs.append(
                    F.sum(r.violation.cast("bigint")).alias(f"v__{r.name}")
                )
            elif r.unique_col is not None:
                aggs.append(
                    (
                        F.count(r.unique_col) - F.count_distinct(r.unique_col)
                    ).alias(f"v__{r.name}")
                )
            else:
                raise ValueError(f"rule {r.name}: no payload")
        wide = df.agg(*aggs)
        stack = ", ".join(
            f"'{r.name}', `v__{r.name}`" for r in agg_rules
        )
        parts.append(
            wide.selectExpr(
                "__n__ AS n_checked",
                f"stack({len(agg_rules)}, {stack}) AS (rule, n_violations)",
            ).select("rule", "n_checked", "n_violations")
        )

    for r in fk_rules:
        parent, child_key, parent_key = r.fk
        keyed = df.filter(F.col(child_key).isNotNull())
        orphans = keyed.join(
            F.broadcast(parent.select(F.col(parent_key).alias(child_key)).distinct()),
            on=child_key,
            how="left_anti",
        )
        parts.append(
            keyed.agg(F.count(F.lit(1)).alias("n_checked")).crossJoin(
                orphans.agg(F.count(F.lit(1)).alias("n_violations"))
            ).select(F.lit(r.name).alias("rule"), "n_checked", "n_violations")
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # sum() over an empty table is NULL — normalize before deriving ok
    nv = F.coalesce(F.col("n_violations"), F.lit(0)).cast("bigint")
    return out.select(
        "rule",
        F.col("n_checked").cast("bigint").alias("n_checked"),
        nv.alias("n_violations"),
        (nv == 0).cast("int").alias("ok"),
    )
