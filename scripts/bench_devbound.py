"""Device-bound microbench of the indexed epoch program (one final sync).

bench.py's per-chunk scalar syncs each pay a tunnel round trip whose jitter
(+-50-100 ms on a ~400 ms chunk) dominates run-to-run spread in this
environment.  For A/B work this harness launches EPOCHS epochs
back-to-back and syncs ONE scalar at the end: wall / (epochs * steps) is
the device step time to <1% (round-3 methodology).

Usage: [MATCHA_SCAN_UNROLL=2] python scripts/bench_devbound.py
       [--batch 2048] [--steps 100] [--epochs 5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--unrolls", default=None,
                    help="comma list, e.g. '1,2,4': A/B several scan-unroll "
                    "factors in ONE process (one Trainer each; the backend "
                    "init — minutes on a cold tunnel — is paid once)")
    ap.add_argument("--batches", default=None,
                    help="comma list of batch sizes to sweep in one process")
    ap.add_argument("--reps", type=int, default=2,
                    help="timing repetitions per variant")
    args = ap.parse_args()

    import jax
    from matcha_tpu.config import Config
    from matcha_tpu.pipeline import resolve_perf
    perf = resolve_perf(Config(
        fuse_tail=os.environ.get("MATCHA_FUSE_TAIL_MODE", "auto"),
        token_stream=os.environ.get("MATCHA_TOKEN_STREAM", "auto")))
    print(f"# backend {jax.default_backend()} perf {perf}", file=sys.stderr)

    from __graft_entry__ import _build_problem, _random_buckets
    from matcha_tpu.data.batcher import BucketedBatcher
    from matcha_tpu.sampler.bloom import build_bloom_dict
    from matcha_tpu.sampler.negative import ChromTable
    from matcha_tpu.train.runtime import Trainer, TrainSettings

    genome, dims, params, frozen = _build_problem(dim=64, n_head=8,
                                                  chroms=23)
    dims = dims._replace(compute_dtype=perf["compute_dtype"],
                         use_pallas_attention=perf["use_pallas_attention"])
    rng = np.random.default_rng(0)
    max_b = max([int(b) for b in args.batches.split(",")]
                if args.batches else [args.batch])
    buckets = _random_buckets(genome, rng,
                              n_edges=max(4 * max_b, 20_000),
                              k_list=(2, 3, 4, 5))
    blooms = build_bloom_dict({k: v[0] for k, v in buckets.items()})
    settings = TrainSettings(alpha=1.0, beta=0.001, neg_num=3,
                             token_stream=perf["token_stream"],
                             propose_impl=perf["propose_impl"])
    table = ChromTable.from_genome(genome)

    unrolls = ([int(u) for u in args.unrolls.split(",")] if args.unrolls
               else [int(os.environ.get("MATCHA_SCAN_UNROLL", "1"))])
    batches = ([int(b) for b in args.batches.split(",")] if args.batches
               else [args.batch])
    variants = [(u, b) for u in unrolls for b in batches]
    for u, bsz in variants:
        os.environ["MATCHA_SCAN_UNROLL"] = str(u)
        trainer = Trainer(params, frozen, dims, table, settings,
                          blooms=blooms)
        batcher = BucketedBatcher(buckets, batch_size=bsz,
                                  num_batch_per_iter=args.steps)
        assert trainer.pin_base_buckets(batcher)
        t0 = time.time()
        jax.device_get(trainer.train_epoch_indexed_launch(batcher)["bce"])
        print(f"# unroll {u}: warmup {time.time() - t0:.1f}s",
              file=sys.stderr)
        for rep in range(args.reps):
            t0 = time.time()
            aux = None
            for _ in range(args.epochs):
                aux = trainer.train_epoch_indexed_launch(batcher)
            jax.device_get(aux["bce"])
            wall = time.time() - t0
            n_steps = args.epochs * args.steps
            ms_step = wall / n_steps * 1e3
            he_s = 4 * bsz * 4 * n_steps / wall
            print(json.dumps({
                "metric": "devbound_indexed_epoch",
                "batch": bsz, "steps": n_steps, "rep": rep,
                "unroll": u,
                "ms_per_step": round(ms_step, 3),
                "hyperedges_per_sec": round(he_s),
            }), flush=True)
        del trainer


if __name__ == "__main__":
    main()
