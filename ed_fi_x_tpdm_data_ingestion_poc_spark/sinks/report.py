"""Run report (ref R26).

The reference writes `<date>-<time>.report` with upsert/delete counts,
duration, an error list, and a fatal section
(/root/reference/banner-connector/src/main/java/org/edfi/sis/model/
SisConnectorResponse.java:96-138, populated by service/
SisConnectorService.java:735-754).

Engine version: outcome DataFrames from the sinks aggregate into a
RunReport; counts come from one distributed aggregation, not driver
counters.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class RunReport:
    upsert_count: int = 0
    delete_count: int = 0
    error_count: int = 0
    errors: list[str] = field(default_factory=list)
    fatal_error: bool = False
    error_message: str | None = None
    start_time: float = field(default_factory=time.time)
    end_time: float | None = None

    @property
    def duration_sec(self) -> float:
        return (self.end_time or time.time()) - self.start_time

    def render(self) -> str:
        """Text shape mirroring SisConnectorResponse.buildReport:96-138."""
        lines = []
        if self.fatal_error:
            lines += ["FATAL ERROR", f"  {self.error_message or ''}", ""]
        lines += [
            f"Upsert count: {self.upsert_count}",
            f"Delete count: {self.delete_count}",
            f"Duration (s): {self.duration_sec:.3f}",
            f"Errors ({self.error_count}):",
        ]
        lines += [f"  {e}" for e in self.errors]
        return "\n".join(lines) + "\n"


def build_report(outcomes: DataFrame, *, max_errors: int = 100) -> RunReport:
    """Aggregate sink outcome rows (schema rest_sink.OUTCOME_SCHEMA) into a
    report in ONE action.

    The input is side-effecting (each mapInPandas partition POSTs/DELETEs
    against the remote API), so a second action would replay every HTTP call
    and sample errors from a *different* execution than the counts. Counts
    and the bounded error sample therefore come from a single grouped
    aggregation: the error strings are formatted in-query and collect_list'd
    per (op, ok=false) group, sliced to max_errors driver-side. Error volume
    is operator-bounded (a sink where errors rival data volume has already
    failed); callers that re-use `outcomes` for anything else should persist
    it first (app.run does)."""
    err_str = F.when(
        ~F.col("ok"),
        F.format_string(
            "%s %s: HTTP %s %s",
            F.col("op"),
            F.col("key"),
            F.coalesce(F.col("status").cast("string"), F.lit("None")),
            F.coalesce(F.col("error"), F.lit("None")),
        ),
    )
    agg = (
        outcomes.select("op", "ok", err_str.alias("err"))
        .groupBy("op", "ok")
        .agg(F.count(F.lit(1)).alias("n"), F.collect_list("err").alias("errs"))
        .collect()
    )
    report = RunReport()
    for row in agg:
        if row.op == "upsert" and row.ok:
            report.upsert_count = row.n
        elif row.op == "delete" and row.ok:
            report.delete_count = row.n
        if not row.ok:
            report.error_count += row.n
            report.errors.extend(row.errs[: max_errors - len(report.errors)])
    report.end_time = time.time()
    return report


def write_report(report: RunReport, path: str) -> None:
    with open(path, "w") as f:
        f.write(report.render())
