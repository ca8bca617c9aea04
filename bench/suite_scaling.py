"""Per-query scale-up curve: how the 81-query suite's steady-state cost
moves with input scale (sf0.01 -> sf0.1 is a 10x row-count step).

Reads two bench.py verbose records (the first stdout line, or
BENCH/last_run.json) and prints a markdown table of steady seconds at
each scale plus the ratio. The diagnostic the table answers at a
glance: a query whose cost is FLAT across a 10x data step is paying
fixed overhead (scheduler, planning, session) — it has headroom; a
query near 10x is data-bound — ITS plan shape is what survives or dies
at 100 TB, so those rows are the ones to plan-audit. Ratios well above
the data step flag super-linear work (the thing to fix).

Usage: python bench/suite_scaling.py small.json big.json
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        txt = fh.read()
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith("{"):
            d = json.loads(line)
            if "queries" in d:
                return d
    raise SystemExit(f"no bench record found in {path}")


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    small, big = load(sys.argv[1]), load(sys.argv[2])
    sf_s, sf_b = small.get("sf"), big.get("sf")
    step = (sf_b / sf_s) if sf_s and sf_b and sf_s > 0 else float("nan")
    names = [n for n in big["queries"] if n in small["queries"]]
    rows = []
    for n in names:
        a, b = small["queries"][n], big["queries"][n]
        if a is None or b is None or a < 0 or b < 0:
            continue
        rows.append((n, a, b, b / a if a > 0 else float("inf")))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | sf{sf_s} s | sf{sf_b} s | ratio (data step {step:.0f}x) |")
    print("|---|---|---|---|")
    for n, a, b, r in rows:
        print(f"| {n} | {a:.2f} | {b:.2f} | {r:.2f} |")
    tot_a = sum(r[1] for r in rows)
    tot_b = sum(r[2] for r in rows)
    if not rows or tot_a == 0:
        raise SystemExit("no comparable queries between the two records")
    print(f"| **total ({len(rows)} shared)** | {tot_a:.1f} | {tot_b:.1f} | "
          f"{tot_b / tot_a:.2f} |")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `| head` is a legitimate way to read this
        pass
