"""Scaling report: hyperedges/s at 1 device vs N devices.

BASELINE.json requires a 1-chip / 1-host / N-host hyperedges/s report.  This
script produces it when pointed at real multi-chip hardware (run under
`jax.distributed` on each host; the mesh spans all devices).

CAVEAT: in this development environment only ONE real chip exists.  The
`--cpu N...` mode runs the same sharded program on forced-host virtual
devices — that validates the SPMD mechanics end-to-end, but all virtual
devices share the same physical cores, so wall-clock "efficiency" numbers
from it are meaningless and must not be quoted as scaling results.

Usage:
  python scripts/scaling_report.py            # real backend (single chip)
  python scripts/scaling_report.py --cpu 1 2 4 8   # mechanics only
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def measure(n_data: int, n_model: int, batch: int, steps: int = 10,
            dim: int = 64, chroms: int = 23):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/matcha_jax_cache")
    from __graft_entry__ import _build_problem, _random_buckets
    from matcha_tpu.data.batcher import BucketedBatcher
    from matcha_tpu.parallel.mesh import make_mesh
    from matcha_tpu.sampler.bloom import build_bloom_dict
    from matcha_tpu.sampler.negative import ChromTable
    from matcha_tpu.train.runtime import Trainer, TrainSettings

    genome, dims, params, frozen = _build_problem(dim=dim, n_head=8,
                                                  chroms=chroms)
    rng = np.random.default_rng(0)
    buckets = _random_buckets(genome, rng, n_edges=max(4 * batch, 8192),
                              k_list=(2, 3, 4, 5))
    blooms = build_bloom_dict({k: v[0] for k, v in buckets.items()})
    mesh = None
    if n_data * n_model > 1:
        mesh = make_mesh(n_data, n_model,
                         devices=jax.devices()[:n_data * n_model])
    trainer = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                      TrainSettings(alpha=1.0, beta=0.001), blooms=blooms,
                      mesh=mesh)
    batcher = BucketedBatcher(buckets, batch_size=batch,
                              num_batch_per_iter=steps)
    trainer.train_epoch(batcher)               # compile
    best = min(trainer.train_epoch(batcher)["elapsed"] for _ in range(3))
    per_step = 4 * batch * 4
    return per_step * steps / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", nargs="*", type=int, default=None,
                    help="device counts to sweep on the virtual CPU mesh")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--chroms", type=int, default=23)
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count="
                                   + str(max(args.cpu)))
        import jax
        jax.config.update("jax_platforms", "cpu")
        results = {}
        for n in args.cpu:
            rate = measure(n, 1, args.batch * n, dim=args.dim, chroms=args.chroms)
            results[n] = rate
            print(f"# {n} devices (data-parallel, batch {args.batch}/device):"
                  f" {rate:,.0f} hyperedges/s")
        base = results[min(results)] / min(results)
        eff = {n: results[n] / (n * base) for n in results}
        print(json.dumps({"rates": results, "weak_scaling_efficiency": eff}))
    else:
        rate = measure(1, 1, args.batch, dim=args.dim, chroms=args.chroms)
        print(json.dumps({"devices": 1, "rate": rate}))


if __name__ == "__main__":
    main()
