"""Walk-table construction at scale (VERDICT r4 #8).

The reference tabulates first-order transition rows across an 80-process
pool and second-order rows across another pool, overnight at manuscript
scale (ref History_version/Code/random_walk_hyper.py:144-190,305-356).
Here the whole build is vectorized host numpy/scipy: the co-occurrence
weights are ONE sparse product, first-order rows are CSR slices, and each
dst's second-order block is one sparse B.T @ B (walks/hyper.py).  This
script times every phase at >= 1M SPRITE-like clusters on this host and
prints one JSON line (wall + peak RSS per phase) for BASELINE.md.

Usage: python scripts/bench_walk_build.py [--clusters 1000000]
       [--num-walks 10] [--simulate]
"""

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clusters", type=int, default=1_000_000)
    ap.add_argument("--num-walks", type=int, default=10)
    ap.add_argument("--walk-length", type=int, default=80)
    ap.add_argument("--simulate", action="store_true",
                    help="also time walk simulation + pair extraction")
    args = ap.parse_args()

    # force CPU: this is a host-pipeline benchmark (the SGNS consumer is
    # benched separately on the chip by bench_skipgram.py)
    import jax
    jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _build_problem
    from matcha_tpu.walks.hyper import build_walk_tables

    genome, _, _, _ = _build_problem(dim=32, chroms=23)
    n = genome.num_nodes
    rng = np.random.default_rng(0)
    # SPRITE-like local clusters (same generator as bench_skipgram /
    # datascale_4dn): heavy-tailed sizes, members within a local window
    t0 = time.time()
    sizes = rng.choice([2, 3, 4, 5, 6, 8, 12],
                       p=[.4, .2, .15, .1, .08, .05, .02],
                       size=args.clusters)
    edges = []
    for s in sizes:
        s = int(s)
        a = int(rng.integers(0, max(n - 2 * s - 2, 1)))
        offs = rng.choice(2 * s + 2, s, replace=False)
        edges.append(np.sort(a + offs).astype(np.int64))
    gen_s = time.time() - t0
    total_members = int(sizes.sum())
    print(f"# {args.clusters:,} clusters ({total_members / 1e6:.1f}M "
          f"members) generated in {gen_s:.1f}s", file=sys.stderr)

    timings = {}
    t0 = time.time()
    first, second, edge_keys = build_walk_tables(n, edges,
                                                 weight_backend="scipy",
                                                 timings=timings)
    build_s = time.time() - t0
    out = {
        "metric": "walk_table_build",
        "clusters": args.clusters,
        "cluster_members": total_members,
        "nodes": n,
        "build_s": round(build_s, 1),
        "build_rss_mb": round(rss_mb()),
        "second_order_pairs": int(len(edge_keys)),
        **timings,
    }
    print(f"# build {build_s:.1f}s  RSS {rss_mb():.0f} MB  "
          f"phases {timings}", file=sys.stderr)

    if args.simulate:
        from matcha_tpu.walks.alias import simulate_second_order_walks
        t0 = time.time()
        walks = simulate_second_order_walks(
            n, first, second, edge_keys, args.num_walks, args.walk_length,
            np.random.default_rng(1))
        out["simulate_s"] = round(time.time() - t0, 1)
        out["walk_tokens"] = int(walks.size)
        print(f"# simulate {out['simulate_s']}s -> "
              f"{walks.size / 1e6:.1f}M tokens", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
