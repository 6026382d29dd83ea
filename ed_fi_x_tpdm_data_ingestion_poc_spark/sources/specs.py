"""Pipeline-spec loader: a directory of `.sql` files + `.map` column maps.

Mirrors the reference's runtime inputs
(/root/reference/runtime/input/sql/*.sql, /root/reference/runtime/input/
columnmap/*.map) and their loaders:
  * readSql joins lines with single spaces; the query name is the filename
    stem (SisConnectorService.java:797-812 parseName, :801-812 readSql);
  * readColumnMap parses `logical=PHYSICAL` lines (:814-828).

Divergence (documented, SURVEY.md §2.2): the engine VALIDATES — a SQL file
that fails to parse raises instead of returning an empty result
(Dao.java:71-74 swallows SQLException), and a map entry whose physical
column never appears raises under strict mode (vs the silent index=-1 ->
null at :830-836).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from ..operators.rename import parse_column_map


@dataclass
class PipelineSpec:
    sql: dict[str, str] = field(default_factory=dict)  # name -> SQL text
    column_maps: dict[str, dict[str, str]] = field(default_factory=dict)


def read_sql_file(path: str) -> str:
    """Join lines with spaces (readSql semantics)."""
    with open(path) as f:
        return " ".join(line.strip() for line in f if line.strip())


def load_spec(input_dir: str) -> PipelineSpec:
    """Load `<input_dir>/sql/*.sql` and `<input_dir>/columnmap/*.map`."""
    spec = PipelineSpec()
    sql_dir = os.path.join(input_dir, "sql")
    map_dir = os.path.join(input_dir, "columnmap")
    if os.path.isdir(sql_dir):
        for fn in sorted(os.listdir(sql_dir)):
            if fn.endswith(".sql"):
                spec.sql[fn[: -len(".sql")]] = read_sql_file(os.path.join(sql_dir, fn))
    if os.path.isdir(map_dir):
        for fn in sorted(os.listdir(map_dir)):
            if fn.endswith(".map"):
                with open(os.path.join(map_dir, fn)) as f:
                    spec.column_maps[fn[: -len(".map")]] = parse_column_map(f.read())
    return spec
