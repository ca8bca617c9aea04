"""Summarize a scaling-ladder jsonl (bench/ladder_pair.sh output).

Prints per-level medians, per-pair efficiencies, and the steal-clean
subset (both runs of a pair under the steal threshold) — the numbers
BENCH/BASELINE.md publishes. Usage:

    python bench/ladder_summary.py BENCH/ladder_r4.jsonl [--clean-steal 1.0]
"""

from __future__ import annotations

import argparse
import json
import statistics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--clean-steal", type=float, default=1.0,
                    help="max total steal%% for a run to count as clean")
    ap.add_argument("--clean-bw", type=float, default=1.2,
                    help="min pre-run fresh_gbs for the bandwidth-clean "
                         "view (runs without the probe label are excluded)")
    ap.add_argument("--lo", type=int, default=1, help="N parallelism level")
    ap.add_argument("--hi", type=int, default=4, help="4N parallelism level")
    args = ap.parse_args()

    rows = [json.loads(l) for l in open(args.path) if l.strip()]
    lo = [r for r in rows if r["p"] == args.lo]
    hi = [r for r in rows if r["p"] == args.hi]

    def med(rs):
        return statistics.median(r["ev_s"] for r in rs) if rs else float("nan")

    def clean(rs):
        return [r for r in rs if r.get("steal_pct") is not None
                and r["steal_pct"] <= args.clean_steal]

    m_lo, m_hi = med(lo), med(hi)
    print(f"levels: p{args.lo} n={len(lo)} median={m_lo:.0f} ev/s | "
          f"p{args.hi} n={len(hi)} median={m_hi:.0f} ev/s")
    print(f"all-runs median efficiency: {(m_hi / m_lo) / (args.hi / args.lo):.2f}")

    # Best-of-N: interference on a shared host is one-sided (it can only
    # slow a run), so max-per-level is the least-contaminated estimate —
    # the same estimator the reference benchmark uses (benchmark.d:90-105).
    b_lo = max(r["ev_s"] for r in lo) if lo else float("nan")
    b_hi = max(r["ev_s"] for r in hi) if hi else float("nan")
    print(f"best-of-N: p{args.lo} {b_lo:.0f} | p{args.hi} {b_hi:.0f} | "
          f"efficiency {(b_hi / b_lo) / (args.hi / args.lo):.2f}")

    pairs = list(zip(lo, hi))
    effs = [(h["ev_s"] / l["ev_s"]) / (args.hi / args.lo) for l, h in pairs]
    if effs:
        print("per-pair efficiencies:", " ".join(f"{e:.2f}" for e in effs),
              f"| median {statistics.median(effs):.2f}")

    c_lo, c_hi = clean(lo), clean(hi)
    if c_lo and c_hi:
        print(f"steal-clean (<= {args.clean_steal}%): "
              f"p{args.lo} n={len(c_lo)} median={med(c_lo):.0f} | "
              f"p{args.hi} n={len(c_hi)} median={med(c_hi):.0f} | "
              f"efficiency {(med(c_hi) / med(c_lo)) / (args.hi / args.lo):.2f}")
    else:
        print("steal-clean subset: insufficient clean runs")

    # Bandwidth-clean view: the steal counter misses co-tenant DRAM
    # saturation (BENCH/BASELINE.md round 4), so runs fired by the
    # probe-gated collectors carry a pre-run fresh-mapping bandwidth
    # label; this view keeps only runs whose window measured healthy.
    def bw_clean(rs):
        return [r for r in rs if (r.get("fresh_gbs") or 0) >= args.clean_bw]

    g_lo, g_hi = bw_clean(lo), bw_clean(hi)
    if g_lo and g_hi:
        print(f"bw-clean (fresh >= {args.clean_bw} GB/s): "
              f"p{args.lo} n={len(g_lo)} median={med(g_lo):.0f} best={max(r['ev_s'] for r in g_lo):.0f} | "
              f"p{args.hi} n={len(g_hi)} median={med(g_hi):.0f} best={max(r['ev_s'] for r in g_hi):.0f} | "
              f"median efficiency {(med(g_hi) / med(g_lo)) / (args.hi / args.lo):.2f}")
    else:
        print(f"bw-clean subset (fresh >= {args.clean_bw} GB/s): "
              f"insufficient labeled runs (p{args.lo} n={len(g_lo)}, "
              f"p{args.hi} n={len(g_hi)})")

    # Protocol view — the published estimator for asymmetric collection
    # (BENCH/BASELINE.md round 4): the host's DRAM-saturation mode barely
    # touches a 1-core run but throttles multi-core runs 2-3x, so pN-lo
    # samples are valid in ANY steal-clean window while pN-hi samples
    # count only when fired into a probe-healthy window. Best-of-N per
    # level (interference is one-sided), ratio over the core ratio.
    p_lo = clean(lo)
    p_hi = clean(bw_clean(hi))
    if p_lo and p_hi:
        pb_lo = max(r["ev_s"] for r in p_lo)
        pb_hi = max(r["ev_s"] for r in p_hi)
        print(f"PROTOCOL (p{args.lo} steal-clean any-window n={len(p_lo)}, "
              f"p{args.hi} steal+bw-clean n={len(p_hi)}): "
              f"best p{args.lo} {pb_lo:.0f} | best p{args.hi} {pb_hi:.0f} | "
              f"efficiency {(pb_hi / pb_lo) / (args.hi / args.lo):.2f}")
    else:
        print(f"PROTOCOL view: insufficient runs "
              f"(p{args.lo} steal-clean n={len(p_lo)}, "
              f"p{args.hi} steal+bw-clean n={len(p_hi)})")


if __name__ == "__main__":
    main()
