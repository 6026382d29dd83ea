"""Plan inspection and audit utilities (scale regression checks)."""

from .audit import PlanFacts, audit, plan_string, scan_columns  # noqa: F401
