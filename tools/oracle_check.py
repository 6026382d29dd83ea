"""Local replica of the driver's t2 correctness gate.

Runs each declared query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and an
order-insensitive value hash (floats rounded to 9 significant-ish digits,
columns sorted by name). Usage:

    python tools/oracle_check.py [--json OUT.json] [sf_dir] [query ...]

With --json, also writes a driver-style artifact — one
{rows_match, schema_match, hash_match, spark_rows, oracle_rows, err}
object per query under its CURRENT registry name — so a full-surface
sweep can be committed as a single-file certification (VERDICT r16 #1:
the q->qz rotation broke the per-name traceability chain across the
driver's historical CORRECTNESS_r*.json samples; this closes it).
Queries without an oracle record the weaker rows-only check as
{rows_match: spark_rows >= 0, oracle_rows: null, mode: "rows_only"}.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_digest(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), sorted(cols), h


def spark_result(spec, spark, sf_dir):
    df = spec.build(spark, sf_dir)
    rows = [tuple(r) for r in df.collect()]
    return frame_digest(list(df.columns), rows)


def duck_result(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return frame_digest(cols, rows)


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            print(
                "ERROR: --json requires an output path "
                "(usage: oracle_check.py [--json OUT.json] [sf_dir] [query ...])",
                file=sys.stderr,
            )
            return 2
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    from ed_fi_x_tpdm_data_ingestion_poc_spark.queries import all_queries
    from ed_fi_x_tpdm_data_ingestion_poc_spark.session import get_spark

    specs = all_queries()
    unknown = sorted(only - set(specs))
    if unknown:
        # A misspelled sweep must never read as a pass: checking nothing
        # and printing "0 failures" is how a verification hole hides.
        print(
            f"ERROR: unknown query name(s): {unknown}", file=sys.stderr
        )
        return 2

    spark = get_spark()
    failures = []
    report: dict[str, dict] = {}
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sn, scols, shash = spark_result(spec, spark, sf_dir)
        except Exception as e:
            failures.append(name)
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": f"spark error: {e}"[:500],
            }
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if spec.oracle is None:
            print(f"ok?   {name}: rows={sn} (no oracle, rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            if sn < 0:
                failures.append(name)
            report[name] = {
                "rows_match": sn >= 0, "schema_match": None,
                "hash_match": None, "spark_rows": sn,
                "oracle_rows": None, "err": None, "mode": "rows_only",
            }
            continue
        try:
            dn, dcols, dhash = duck_result(spec.oracle, sf_dir)
        except Exception as e:
            failures.append(name)
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": sn,
                "oracle_rows": None, "err": f"duckdb error: {e}"[:500],
            }
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        status = "OK  " if (sn, scols, shash) == (dn, dcols, dhash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        report[name] = {
            "rows_match": sn == dn, "schema_match": scols == dcols,
            "hash_match": shash == dhash, "spark_rows": sn,
            "oracle_rows": dn, "err": None,
        }
        print(
            f"{status}  {name}: spark({sn},{shash}) duck({dn},{dhash})"
            + ("" if scols == dcols else f" COLS spark={scols} duck={dcols}")
            + f" [{time.time()-t0:.1f}s]"
        )
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(report)} queries)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
