"""Round-over-round BENCH_DETAIL.json comparison (VERDICT r15 #7).

BENCH_DETAIL.json is overwritten in place each bench run; this tool makes
it diffable anyway by reading the prior blob straight from git history and
reporting the comparison BASELINE.md's round-close notes use:

  * common-key per-query sum, old vs new, and the delta — the honest
    regression signal, immune to suite growth (new queries inflate the
    headline without meaning anything regressed);
  * the worst single per-query regressions and improvements;
  * keys added / removed (name rotations show up here, not as phantom
    regressions — rotation-normalize q/qz prefixes before comparing);
  * build_s totals (exclusive-per-label attribution; per the standing
    note, rotation-induced build jumps are attribution artifacts).

Usage:
    python tools/bench_diff.py [old_rev] [new_path_or_rev]

Defaults: old_rev = HEAD (last committed blob), new = ./BENCH_DETAIL.json
(the working-tree blob just produced by bench.py). Pass two revs (e.g.
`r15-tag HEAD`) to compare any two committed rounds. Prints one human
block and one machine JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _norm(name: str) -> str:
    """Rotation-normalize a per-query key: the round-close name rotation
    renames qNNN -> qzNNN without touching the body, so q264/qz264 are
    the same measurement."""
    return name[2:] if name.startswith("qz") else name[1:]


def load(ref: str) -> dict:
    """Load a BENCH_DETAIL blob from a working-tree path or a git rev."""
    if os.path.exists(ref):
        with open(ref) as f:
            return json.load(f)
    out = subprocess.run(
        ["git", "-C", REPO, "show", f"{ref}:BENCH_DETAIL.json"],
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout)


def diff(old: dict, new: dict) -> dict:
    qo = {_norm(k): v for k, v in old.get("queries", {}).items()}
    qn = {_norm(k): v for k, v in new.get("queries", {}).items()}
    common = sorted(set(qo) & set(qn))
    deltas = {k: round(qn[k] - qo[k], 3) for k in common}
    worst = sorted(deltas.items(), key=lambda kv: -kv[1])[:5]
    best = sorted(deltas.items(), key=lambda kv: kv[1])[:5]
    return {
        "n_common": len(common),
        "sum_old": round(sum(qo[k] for k in common), 2),
        "sum_new": round(sum(qn[k] for k in common), 2),
        "sum_delta": round(sum(deltas.values()), 2),
        "worst_regressions": dict(worst),
        "best_improvements": dict(best),
        "added": sorted(set(qn) - set(qo)),
        "removed": sorted(set(qo) - set(qn)),
        "build_old": round(sum(old.get("build_s", {}).values()), 1),
        "build_new": round(sum(new.get("build_s", {}).values()), 1),
        "wall_old": old.get("value"),
        "wall_new": new.get("value"),
    }


def main() -> None:
    old_ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    new_ref = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "BENCH_DETAIL.json")
    )
    d = diff(load(old_ref), load(new_ref))
    print(f"common keys       : {d['n_common']}")
    print(
        f"per-query sum     : {d['sum_old']} -> {d['sum_new']} s"
        f" ({d['sum_delta']:+} s)"
    )
    print(f"wall (concurrent) : {d['wall_old']} -> {d['wall_new']} s")
    print(f"build_s total     : {d['build_old']} -> {d['build_new']} s")
    print(f"worst regressions : {d['worst_regressions']}")
    print(f"best improvements : {d['best_improvements']}")
    if d["added"]:
        print(f"added   ({len(d['added'])}): {', '.join(d['added'][:20])}")
    if d["removed"]:
        print(
            f"removed ({len(d['removed'])}): {', '.join(d['removed'][:20])}"
        )
    print(json.dumps(d, separators=(",", ":")))


if __name__ == "__main__":
    main()
