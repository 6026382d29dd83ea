"""One-command bench-gate ratio: runs the Spark suite (bench.py) and the
DuckDB oracle twin suite (tools/duck_bench.py) back-to-back on the same
sf dir and prints the gate ratios plus the top per-query gaps.

Usage: python tools/bench_ratio.py [sf_dir]
Env:   SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_THREADS pass through to both.

The gate (BASELINE.md row 9) is concurrent-suite wall-clock <= 2x DuckDB.
Run on an idle box — ambient load moves totals +-15% (BASELINE.md round-2
caveat); this script prints load averages so the run is self-describing.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd: list[str], env: dict) -> dict:
    out = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=1800
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:])
        raise SystemExit(f"{cmd} failed rc={out.returncode}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    env = dict(os.environ)
    if len(sys.argv) > 1:
        env["SPARK_GRAFT_SF_DIR"] = sys.argv[1]
    load = os.getloadavg()
    spark = run([sys.executable, "bench.py"], env)
    duck = run([sys.executable, os.path.join("tools", "duck_bench.py")], env)

    conc = spark["value"] / duck["value"]
    seq = spark["seq_s"] / duck["seq_s"]
    gaps = sorted(
        (
            (name, s, duck["queries"].get(name, 0.0))
            for name, s in spark["queries"].items()
        ),
        key=lambda t: t[1] - t[2],
        reverse=True,
    )
    print(f"load avg at start: {load[0]:.2f} {load[1]:.2f} {load[2]:.2f}")
    print(
        f"concurrent (headline): spark {spark['value']:.2f}s"
        f" duck {duck['value']:.2f}s ratio {conc:.2f}x (gate <= 2x)"
    )
    print(
        f"sequential medians:    spark {spark['seq_s']:.2f}s"
        f" duck {duck['seq_s']:.2f}s ratio {seq:.2f}x"
    )
    print("top per-query gaps (spark_s, duck_s):")
    for name, s, d in gaps[:10]:
        print(f"  {name}: {s:.2f} vs {d:.2f}")
    print(
        json.dumps(
            {
                "metric": "bench_gate_concurrent_ratio",
                "value": round(conc, 3),
                "unit": "x",
                "spark_concurrent_sec": spark["value"],
                "duck_concurrent_sec": duck["value"],
                "spark_sequential_sec": spark["seq_s"],
                "duck_sequential_sec": duck["seq_s"],
                "load_avg_1m": round(load[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
