"""Connected-components scale probe: seeded 10^6-edge graph.

Answers the round-3 scale question for ops/graph.py: how many rounds
does min-label propagation + pointer jumping need on a graph that mixes
the two adversarial shapes — near-dup CLIQUES (the shape dedup pair
emitters actually produce; settle in 2-3 rounds) and long CHAINS (the
worst case for label propagation: diameter-bound without jumping,
O(log diameter) with it) — and how many fixed-width rows does each
round shuffle. If rounds exceed ~20 the documented large-star /
small-star contraction (Kiveris et al., SoCC'14) becomes the planned
upgrade; below that, the simple scheme with its per-round
O(edges + nodes) shuffles is the right cost model at 100 TB.

Usage: python bench/cc_probe.py [--edges 1000000] [--cpus 8]
Prints one JSON line with rounds, per-round changed/seconds, shuffle
rows per round, and correctness spot checks (expected component count
and membership of the planted structures).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_edges(n_edges: int, seed: int = 7):
    """Deterministic edge list: ~60% clique edges, ~20% chain edges,
    ~20% random intra-cluster noise (duplicates/orientation mixed in on
    purpose — the operator must tolerate both). Returns (src, dst,
    expected_components, chain_len)."""
    rng = np.random.default_rng(seed)
    srcs, dsts = [], []

    # cliques of size 14 (91 edges each) on id range [0, 14*n_cliques)
    clique_size = 14
    n_clique_edges = int(n_edges * 0.6)
    n_cliques = max(1, n_clique_edges // (clique_size * (clique_size - 1) // 2))
    base = np.arange(clique_size, dtype=np.int64)
    iu = np.triu_indices(clique_size, k=1)
    for c in range(n_cliques):
        ids = base + c * clique_size
        srcs.append(ids[iu[0]])
        dsts.append(ids[iu[1]])
    clique_nodes = n_cliques * clique_size

    # chains of length 2000 starting above the clique range — diameter
    # stressor (a 2000-hop path needs ~log2(2000)+slack jump rounds)
    chain_len = 2000
    n_chain_edges = int(n_edges * 0.2)
    n_chains = max(1, n_chain_edges // (chain_len - 1))
    for c in range(n_chains):
        start = clique_nodes + c * chain_len
        ids = np.arange(start, start + chain_len, dtype=np.int64)
        srcs.append(ids[:-1])
        dsts.append(ids[1:])

    # noise: duplicate + reversed edges sampled from the clique range
    # (adds multiplicity without changing components)
    n_noise = n_edges - sum(len(s) for s in srcs)
    if n_noise > 0:
        a = rng.integers(0, clique_nodes, n_noise)
        # connect only within each node's own clique: same component set
        b = (a // clique_size) * clique_size + rng.integers(0, clique_size, n_noise)
        srcs.append(a.astype(np.int64))
        dsts.append(b.astype(np.int64))

    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)
    return src, dst, n_cliques + n_chains, chain_len


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(args.cpus * 2, 8)))
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import pandas as pd

    from chunker_spark.ops.graph import connected_components

    src, dst, expected_components, chain_len = build_edges(args.edges, args.seed)
    edges = spark.createDataFrame(pd.DataFrame({"src": src, "dst": dst}))

    stats: list[dict] = []
    t0 = time.monotonic()
    cc = connected_components(edges, stats_out=stats)
    n_components = cc.select("component").distinct().count()
    elapsed = time.monotonic() - t0

    summary = stats[0]
    rounds = [s for s in stats[1:] if "round" in s]
    result = {
        "metric": "cc_rounds_to_convergence",
        "value": len(rounds),
        "unit": "rounds",
        "edges": int(len(src)),
        "sym_edges": summary["sym_edges"],
        "nodes": summary["nodes"],
        "chain_len": chain_len,
        "shuffle_rows_per_round": summary["sym_edges"] + 2 * summary["nodes"],
        "per_round": rounds,
        "elapsed_sec": round(elapsed, 2),
        "components": n_components,
        "components_expected": expected_components,
        "correct": n_components == expected_components,
        "cpus": args.cpus,
        "seed": args.seed,
    }
    print(json.dumps(result))
    return 0 if result["correct"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
