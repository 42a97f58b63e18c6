"""Inference apps at the manuscript's production resolution (VERDICT r4 #9):
denoise_contact (fast path) + predict_multiway at 100 kb, ALL chromosomes
(hg38 autosomes + chrX, 30,344 bins) — the matrices the paper actually
shipped (ref Code/denoise_contact.py:147-228).

Per chromosome: the closed-form pairwise fast path scores all intra-chrom
pairs (two matmuls, apps/pairwise_fast.py), the full reference
normalization chain runs (sqrt-coverage, max-combine, gap zeroing,
quantile), pixels are written into a cooler-layout denoised.mcool; the
fast-vs-batched-forward probability deviation is measured on a random
sample of pairs per chromosome (sample size logged — full batched scoring
of all 33M pairs would add ~hours of forwards, which is exactly what the
fast path replaces).  Heatmap PNGs are excluded (pure matplotlib wall).

Prints one JSON line for BASELINE.md.
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

HG38 = [248_956_422, 242_193_529, 198_295_559, 190_214_555, 181_538_259,
        170_805_979, 159_345_973, 145_138_636, 138_394_717, 133_797_422,
        135_086_622, 133_275_309, 114_364_328, 107_043_718, 101_991_189,
        90_338_345, 83_257_441, 80_373_285, 58_617_616, 64_444_167,
        46_709_983, 50_818_468, 156_040_895]


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--deviation-sample", type=int, default=100_000,
                    help="pairs per chromosome checked against the "
                         "batched-forward path (0 = skip)")
    ap.add_argument("--multiway-queries", type=int, default=1000)
    ap.add_argument("--out", default="/tmp/matcha_apps_100kb")
    ap.add_argument("--max-chroms", type=int, default=0,
                    help="restrict to the first N chromosomes (CPU shakeout)")
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        # this jax distro ignores the env var; force via config — without
        # this a "CPU" shakeout silently grabs (and can wedge) the tunneled
        # TPU out from under a concurrent bench
        jax.config.update("jax_platforms", "cpu")
    import h5py
    from bench_100kb import build_frozen_synthetic
    from matcha_tpu.genome import GenomeBins
    from matcha_tpu.models.hypersagnn import ModelDims, init_model, forward
    from matcha_tpu.apps.denoise_contact import (denoise_chromosome,
                                                 _write_mcool_skeleton)
    from matcha_tpu.apps.pairwise_fast import pairwise_proba_matrix
    from matcha_tpu.utils import warm_loop_runtime
    warm_loop_runtime()

    names = [f"chr{i+1}" for i in range(22)] + ["chrX"]
    sizes_bp = HG38
    if args.max_chroms:
        names = names[: args.max_chroms]
        sizes_bp = HG38[: args.max_chroms]
    genome = GenomeBins(names, sizes_bp, 100_000)
    n = genome.num_nodes
    print(f"# nodes: {n}", file=sys.stderr)
    dims = ModelDims(dim=64, n_head=8, num_chroms=genome.num_chroms,
                     num_nodes=n,
                     compute_dtype="bfloat16",
                     use_pallas_attention=jax.default_backend() != "cpu")
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes)
    t0 = time.time()
    frozen = build_frozen_synthetic(genome, jax.numpy.bfloat16)
    jax.block_until_ready(frozen.inter_z)
    setup_s = time.time() - t0
    print(f"# frozen built in {setup_s:.1f}s", file=sys.stderr)

    # synthetic per-chrom banded contact blocks as the "origin" counts;
    # assembled lazily per chromosome to avoid a dense (N, N) host matrix
    rng = np.random.default_rng(1)

    os.makedirs(args.out, exist_ok=True)
    mcool_path = os.path.join(args.out, "denoised.mcool")
    t_total = time.time()
    per_chrom = []
    total_pairs = 0
    max_dev = 0.0
    with h5py.File(mcool_path, "w") as f:
        grp = _write_mcool_skeleton(f, genome)
        bin1, bin2, count = [], [], []
        for c in range(genome.num_chroms):
            s, e = genome.chrom_range[c]
            w = e - s
            # banded synthetic counts (SPRITE-like decay)
            block = np.zeros((w, w), np.float32)
            ii = np.arange(w)
            for off in range(1, min(w, 200)):
                v = rng.random(w - off).astype(np.float32) / off
                block[ii[:-off], ii[:-off] + off] = v
            intra = np.zeros((0,))          # per-chrom indexed below

            t0 = time.time()
            # denoise_chromosome expects global-id indexing of intra_adj;
            # wrap the local block in a tiny shim object
            class _Shim:
                def __getitem__(self, idx):
                    r, ccol = idx
                    return block[np.asarray(r) - (s - 1),
                                 np.asarray(ccol) - (s - 1)]
            pairs, my, origin, proba_m, values = denoise_chromosome(
                params, frozen, dims, genome, _Shim(), c,
                min_distance=0, use_fast=True)
            wall = time.time() - t0
            total_pairs += len(pairs)

            dev = None
            if args.deviation_sample:
                take = min(args.deviation_sample, len(pairs))
                sel = rng.permutation(len(pairs))[:take]
                sample = pairs[sel]
                lg = forward(params, frozen, dims,
                             jax.numpy.asarray(sample, jax.numpy.int32),
                             train=False)
                p_batched = np.asarray(
                    jax.nn.sigmoid(lg)).reshape(-1).astype(np.float64)
                full = pairwise_proba_matrix(params, frozen, dims, genome, c)
                p_fast = full[sample[:, 0] - s, sample[:, 1] - s]
                dev = float(np.abs(p_fast - p_batched).max())
                max_dev = max(max_dev, dev)
            per_chrom.append({"chrom": names[c], "bins": int(w),
                              "pairs": int(len(pairs)),
                              "wall_s": round(wall, 1),
                              "max_dev": dev})
            print(f"# {names[c]}: {w} bins {len(pairs) / 1e6:.1f}M pairs "
                  f"{wall:.1f}s dev={dev}", file=sys.stderr)
            bin1.append(pairs[:, 0] - 1)
            bin2.append(pairs[:, 1] - 1)
            count.append(values)
        grp.create_dataset("pixels/bin1_id",
                           data=np.concatenate(bin1).astype(np.int64))
        grp.create_dataset("pixels/bin2_id",
                           data=np.concatenate(bin2).astype(np.int64))
        grp.create_dataset("pixels/count",
                           data=np.concatenate(count).astype(np.float64))
    denoise_s = time.time() - t_total

    # predict_multiway on random multiway queries
    qpath = os.path.join(args.out, "queries.txt")
    with open(qpath, "w") as f:
        for _ in range(args.multiway_queries):
            k = int(rng.integers(2, 6))
            c = int(rng.integers(0, genome.num_chroms))
            s, e = genome.chrom_range[c]
            ids = np.sort(rng.choice(np.arange(s, e), k, replace=False))
            coords = [(int(i) - s) * 100_000 + 50_000 for i in ids]
            f.write("\t".join(f"{names[c]}:{x}" for x in coords) + "\n")
    from matcha_tpu.apps.predict_multiway import parse_interaction_file
    from matcha_tpu.apps.predict import predict_proba
    t0 = time.time()
    tuples = parse_interaction_file(qpath, genome)
    L = max(len(t) for t in tuples)
    x = np.zeros((len(tuples), L), np.int32)
    for i, t in enumerate(tuples):
        x[i, :len(t)] = t
    proba = predict_proba(params, frozen, dims, x)
    np.savetxt(os.path.join(args.out, "output.txt"), proba)
    multiway_s = time.time() - t0

    out = {"metric": "apps_100kb_allgenome",
           "nodes": n, "total_pairs": total_pairs,
           "denoise_s": round(denoise_s, 1),
           "multiway_queries": args.multiway_queries,
           "multiway_s": round(multiway_s, 1),
           "peak_rss_mb": round(rss_mb()),
           "deviation_sample_per_chrom": args.deviation_sample,
           "max_abs_proba_deviation": max_dev,
           "per_chrom": per_chrom}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
