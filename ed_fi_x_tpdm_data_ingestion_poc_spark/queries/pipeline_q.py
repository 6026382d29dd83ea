"""End-to-end ETL pipeline queries (reference semantics R4–R26) and
source-connector checks (Q02 JDBC, Q03 REST).

Populated in the pipeline/sources build phase.
"""

from __future__ import annotations
