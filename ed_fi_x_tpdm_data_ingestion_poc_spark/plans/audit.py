"""Physical-plan audit: assert the plan you'd WANT at 100 TB, not just the
one that happened to pass.

The reference has no plan representation at all (SURVEY.md §3: its "plan"
is a hard-coded call sequence); on Spark the physical plan is where scale
is won or lost. These helpers turn `.explain` output into checkable facts
so tests can pin:

  * small-dimension joins stay BROADCAST (no shuffle of the fact side),
  * filters reach the scan (PushedFilters) and projections prune columns
    (ReadSchema) — a scan reading all columns for a 2-column projection
    is wrong at any scale,
  * hot paths stay inside WholeStageCodegen (JVM, vectorized),
  * no accidental cartesian products.

A plan audit failing is a performance regression caught at test time
instead of at cluster scale.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


@dataclass
class PlanFacts:
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    shuffled_hash_joins: int = 0
    nested_loop_joins: int = 0
    cartesian_products: int = 0
    exchanges: int = 0
    codegen_stages: int = 0  # 0 under AQE pre-execution; see partial_aggs
    partial_aggs: int = 0  # map-side combine before the shuffle
    batched_scans: int = 0  # vectorized parquet reads
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    python_evals: int = 0  # row-at-a-time Python UDF nodes (the slow path)
    arrow_evals: int = 0  # Arrow-batched pandas UDF / mapInPandas nodes

    @property
    def joins(self) -> int:
        return (
            self.broadcast_joins
            + self.sortmerge_joins
            + self.shuffled_hash_joins
            + self.nested_loop_joins
            + self.cartesian_products
        )


def audit(df: DataFrame) -> PlanFacts:
    """Extract checkable facts from the executed (post-AQE-planning) plan."""
    text = plan_string(df)
    facts = PlanFacts(
        broadcast_joins=len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", text)),
        sortmerge_joins=len(re.findall(r"SortMergeJoin", text)),
        shuffled_hash_joins=len(re.findall(r"ShuffledHashJoin", text)),
        nested_loop_joins=len(re.findall(r"BroadcastNestedLoopJoin", text)),
        cartesian_products=len(re.findall(r"CartesianProduct", text)),
        exchanges=len(re.findall(r"\bExchange\b|\(Exchange", text)),
        codegen_stages=len(re.findall(r"WholeStageCodegen", text)),
        partial_aggs=len(re.findall(r"partial_\w+\(", text)),
        batched_scans=len(re.findall(r"Batched: true", text)),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", text),
        read_schemas=re.findall(r"ReadSchema: (\S+)", text),
        python_evals=len(re.findall(r"BatchEvalPython", text)),
        arrow_evals=len(
            re.findall(
                r"ArrowEvalPython|ArrowAggregatePython|MapInPandas|PythonMapInArrow"
                r"|FlatMapGroupsInPandas|WindowInPandas",
                text,
            )
        ),
    )
    return facts


def scan_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each file scan (column-pruning check)."""
    out = []
    for schema in audit(df).read_schemas:
        out.append(set(re.findall(r"(\w+):", schema)))
    return out
