"""Interleaved A/B bench: r1-tagged code vs HEAD, alternated, fresh JVM per
run (VERDICT r2 item 3 — pin down whether the r1→r2 suite drift follows the
code or the VM).

Each run is a fresh subprocess `python bench.py` (fresh JVM, same discipline
as tools/scaling_bench.py) with the same SF dir and CPU count; A and B
alternate within each round so machine degradation over the session hits
both arms equally.  Emits per-query medians and deltas as JSON.

Usage: python tools/ab_bench.py <dirA> <dirB> [rounds] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def run_bench(repo_dir: str, sf_dir: str, cpus: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=cpus,
        PYTHONPATH=repo_dir,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(repo_dir, "bench.py")],
        cwd=repo_dir,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    if out.returncode != 0 or not out.stdout.strip():
        raise RuntimeError(
            f"bench.py in {repo_dir} failed (rc={out.returncode}); "
            f"stderr tail:\n{out.stderr[-2000:]}"
        )
    # bench.py's contract is ONE JSON line on stdout; take the last line that
    # parses, so a stray trailing warning can't poison the result
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"no JSON line in bench.py stdout from {repo_dir}")


def main() -> None:
    a_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r1_worktree"
    b_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo"
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    runs: dict[str, list[dict]] = {"A": [], "B": []}
    for r in range(rounds):
        for label, d in (("A", a_dir), ("B", b_dir)):
            res = run_bench(d, sf_dir, cpus)
            runs[label].append(res["queries"])
            print(
                f"round {r} {label}({d}): total={sum(res['queries'].values()):.1f}s",
                file=sys.stderr,
            )

    def med(samples: list[dict], q: str) -> float | None:
        vals = [s[q] for s in samples if q in s]
        return round(statistics.median(vals), 3) if vals else None

    queries = sorted({q for s in runs["A"] + runs["B"] for q in s})
    table = {}
    for q in queries:
        a, b = med(runs["A"], q), med(runs["B"], q)
        table[q] = {
            "A_med": a,
            "B_med": b,
            "delta_pct": round(100 * (b - a) / a, 1) if a and b else None,
        }
    print(json.dumps({"sf_dir": sf_dir, "rounds": rounds, "per_query": table,
                      "raw": runs}))


if __name__ == "__main__":
    main()
