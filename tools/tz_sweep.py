"""Standing round-close hostile-timezone sweep (VERDICT r15 #4).

Runs the FULL oracle parity sweep (tools/oracle_check.py — Spark vs the
DuckDB twins, row/schema/value-hash) once per zone in
{UTC, Asia/Kathmandu, Australia/Lord_Howe}, each in a FRESH subprocess so
the TZ env var reaches the Spark JVM default zone and DuckDB alike.

Why these zones: the driver's correctness gate runs under UTC only.
Kathmandu (+5:45 modern offset, +5:41:16 pre-1920 LMT) caught the r15
SCD2 family carrying TZ-ful TimestampType endpoints; Lord Howe
(+10:30 standard, +11:00 DST — the only half-hour DST shift in the tz
database) is the remaining hostile calendar case the r15 judge spot-
checked. A query is TZ-clean only if its hash is identical under all
three.

Usage:
    python tools/tz_sweep.py [sf_dir] [query ...]

No query args = the full registry per zone (~3 x full-sweep wall
clock). Exits non-zero if any zone reports failures; prints one summary
line per zone plus a final JSON line.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

ZONES = ("UTC", "Asia/Kathmandu", "Australia/Lord_Howe")
HERE = os.path.dirname(os.path.abspath(__file__))


def run_zone(zone: str, sf_dir: str, queries: list[str]) -> tuple[int, int]:
    env = dict(os.environ, TZ=zone)
    cmd = [sys.executable, os.path.join(HERE, "oracle_check.py"), sf_dir]
    cmd += queries
    out = subprocess.run(cmd, env=env, capture_output=True, text=True)
    text = out.stdout + out.stderr
    fails = len(re.findall(r"^FAIL", text, re.M))
    oks = len(re.findall(r"^OK", text, re.M))
    if fails:
        for line in text.splitlines():
            if line.startswith("FAIL"):
                print(f"  [{zone}] {line}")
    if out.returncode != 0 and not fails:
        # process-level failure (import error, crash) — surface the tail
        print(f"  [{zone}] oracle_check exited {out.returncode}:")
        for line in text.splitlines()[-12:]:
            print(f"  [{zone}] {line}")
        fails = max(fails, 1)
    return oks, fails


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    queries = sys.argv[2:]
    summary = {}
    total_fail = 0
    for zone in ZONES:
        oks, fails = run_zone(zone, sf_dir, queries)
        summary[zone] = {"ok": oks, "fail": fails}
        total_fail += fails
        print(f"{zone:22s} ok={oks} fail={fails}")
    print(json.dumps({"sf_dir": sf_dir, "zones": summary,
                      "green": total_fail == 0}))
    sys.exit(1 if total_fail else 0)


if __name__ == "__main__":
    main()
