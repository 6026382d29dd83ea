"""Column-map rename layer.

Replaces the reference's `.map` files + case-insensitive positional header
matching (/root/reference/banner-connector/src/main/java/org/edfi/sis/service/
SisConnectorService.java:241-276, 321-363, 723-733, 814-828; map format
`logical=PHYSICAL`, e.g. runtime/input/columnmap/teacherCandidate.map:1-10).

Reference behaviors kept / fixed:
  * case-insensitive physical-column match (kept — analyzer-level here);
  * unmatched logical column resolves to NULL (kept as `strict=False`,
    matching index=-1 -> null at SisConnectorService.java:830-836) but the
    engine default is fail-fast (`strict=True`), surfacing the silent
    tppDegreeTypeDescriptor mapping bug class described in SURVEY.md §2.2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class UnmappedColumnError(ValueError):
    """A logical column's physical source is absent from the input."""


def _resolve(df: DataFrame, physical: str) -> str | None:
    """Case-insensitive resolution of a physical column name."""
    lowered = {c.lower(): c for c in df.columns}
    return lowered.get(physical.lower())


def rename_columns(
    df: DataFrame,
    column_map: dict[str, str],
    *,
    strict: bool = True,
    keep_unmapped: bool = False,
) -> DataFrame:
    """Project the input to logical names: {logical: physical}.

    strict=True  -> unknown physical column raises (engine default);
    strict=False -> reference parity: missing column becomes NULL.
    keep_unmapped -> append input columns not consumed by the map.
    """
    cols: list[Column] = []
    used: set[str] = set()
    for logical, physical in column_map.items():
        actual = _resolve(df, physical)
        if actual is None:
            if strict:
                raise UnmappedColumnError(
                    f"logical column {logical!r} maps to {physical!r}, "
                    f"not found in {df.columns}"
                )
            cols.append(F.lit(None).alias(logical))
        else:
            used.add(actual)
            cols.append(F.col(actual).alias(logical))
    if keep_unmapped:
        cols.extend(F.col(c) for c in df.columns if c not in used)
    return df.select(*cols)


def parse_column_map(text: str) -> dict[str, str]:
    """Parse the reference's `.map` format: one `logical=PHYSICAL` per line
    (SisConnectorService.java:814-828). Blank lines / comments skipped."""
    out: dict[str, str] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        logical, _, physical = line.partition("=")
        out[logical.strip()] = physical.strip()
    return out
