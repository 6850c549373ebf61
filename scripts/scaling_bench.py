"""Throughput-scaling evidence for the north rule: the same job at local[N]
and local[4N] on identical input, reporting throughput at both plus scaling
efficiency (= speedup / 4).  Writes/updates the BENCH section of BENCH.md.

Usage: python scripts/scaling_bench.py [N] [sf]   (default N=8, sf=0.1)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "scaling_worker.py"), str(cpus), sf],
        capture_output=True,
        text=True,
        timeout=1800,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf = sys.argv[2] if len(sys.argv) > 2 else "0.1"
    lo = run(n, sf)
    hi = run(4 * n, sf)

    report = {"sf": sf, "n": n, "results": {}}
    lines = [
        "# BENCH — throughput scaling (north-rule evidence)",
        "",
        f"Same job, same input (sf{sf} synthetic fixtures), two parallelism",
        f"levels in this sandbox: `local[{n}]` vs `local[{4*n}]` (the N vs 4N",
        "cluster-size criterion evidenced via core counts; no real cluster",
        "is available here).  Efficiency = (throughput@4N / throughput@N) / 4.",
        "",
        "| workload | rows | local[{n}] sec | local[{n}] rows/s | local[{m}] sec | local[{m}] rows/s | speedup | efficiency |".format(
            n=n, m=4 * n
        ),
        "|---|---|---|---|---|---|---|---|",
    ]
    for key, rows_key in [("sched", "sched_rows"), ("parse", "parse_rows")]:
        t_lo, t_hi = lo[f"{key}_sec"], hi[f"{key}_sec"]
        rows = lo[rows_key]
        thr_lo, thr_hi = rows / t_lo, rows / t_hi
        speedup = t_lo / t_hi
        eff = speedup / 4
        report["results"][key] = {
            "rows": rows,
            f"sec_at_{n}": t_lo,
            f"sec_at_{4*n}": t_hi,
            "speedup": round(speedup, 2),
            "efficiency": round(eff, 3),
        }
        lines.append(
            f"| {key} | {rows} | {t_lo:.1f} | {thr_lo:,.0f} | {t_hi:.1f} | {thr_hi:,.0f} | {speedup:.2f}x | {eff:.2f} |"
        )
    lines += [
        "",
        "- `sched` = canonicalize -> first-wins dedup -> seen anti-join ->",
        "  salted per-host budget (the URLs scheduled+deduped/sec north star).",
        "- `parse` = Arrow-batched default-parser extraction over all pages.",
        "",
        "```json",
        json.dumps(report),
        "```",
        "",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
