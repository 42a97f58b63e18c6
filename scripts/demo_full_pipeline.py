"""Flagship demo: the COMPLETE pipeline at hg38 1 Mb scale on TPU.

Synthesizes a full-genome SPRITE-like dataset (planted community structure),
then runs every stage end-to-end with the reference's training schedule
(3 recon + 30 classification epochs, batch 96, 1000 steps/epoch) and the
inference apps, printing wall-clock per stage.  The reference runs this
workload overnight on a GPU; this demo is the whole thing in minutes.

Usage:  python scripts/demo_full_pipeline.py [--fast]
        --fast: 1+3 epochs, 100 steps/epoch (smoke mode)
"""

import argparse
import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/matcha_jax_cache")

from matcha_tpu.config import Config
from matcha_tpu.genome import GenomeBins
from matcha_tpu.pipeline import run_generate_kmers, run_process, run_train
from synth import make_synthetic_dataset, write_chrom_sizes

HG38 = [248_956_422, 242_193_529, 198_295_559, 190_214_555, 181_538_259,
        170_805_979, 159_345_973, 145_138_636, 138_394_717, 133_797_422,
        135_086_622, 133_275_309, 114_364_328, 107_043_718, 101_991_189,
        90_338_345, 83_257_441, 80_373_285, 58_617_616, 64_444_167,
        46_709_983, 50_818_468, 156_040_895]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--clusters", type=int, default=150_000)
    args = ap.parse_args()

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="matcha_demo_"))
    rng = np.random.default_rng(0)
    names = [f"chr{i+1}" for i in range(22)] + ["chrX"]
    genome = GenomeBins(names, HG38, 1_000_000)
    print(f"genome: {genome.num_nodes} nodes over {len(names)} chromosomes")

    t0 = time.time()
    cluster_path, mcool_path = make_synthetic_dataset(
        tmp, genome, rng, n_clusters=args.clusters, n_communities=400)
    print(f"[synthesize] {args.clusters} clusters: {time.time()-t0:.1f}s")

    config = Config(
        cluster_path=cluster_path, mcool_path=mcool_path,
        resolution=1_000_000, chrom_list=names,
        chrom_size=write_chrom_sizes(tmp, genome),
        temp_dir=str(tmp / "Temp"), max_cluster_size=25, min_distance=0,
        kmer_size=[2, 3, 4, 5], min_freq_cutoff=2,
        quantile_cutoff_for_positive=0.6, quantile_cutoff_for_unlabel=0.4,
        embed_dim=64, n_head=8, batch_size=96,
        num_batch_per_iter=100 if args.fast else 1000,
        compute_dtype="bfloat16", seed=0)

    t0 = time.time()
    run_process(config)
    print(f"[process] ingest: {time.time()-t0:.1f}s")

    t0 = time.time()
    kmers = run_generate_kmers(config)
    n_kmers = sum(len(v[0]) for v in kmers.values())
    print(f"[kmers] {n_kmers:,} k-mers (k=2..5): {time.time()-t0:.1f}s")

    t0 = time.time()
    trainer, history, store = run_train(
        config,
        stage1_epochs=1 if args.fast else 3,
        stage2_epochs=3 if args.fast else 30)
    train_time = time.time() - t0
    final = history[-1]["valid"]["metrics"]
    print(f"[train] {train_time:.1f}s total; final valid AUROC "
          + " ".join(f"{k}:{v['auroc']:.3f}" for k, v in final.items()
                     if isinstance(v, dict)))

    t0 = time.time()
    from matcha_tpu.apps.denoise_contact import run_denoise
    run_denoise(str(tmp / "Temp" / "model2load"),
                output_mcool=str(tmp / "denoised.mcool"),
                log=lambda *a: None)
    print(f"[denoise] all 23 chromosomes -> denoised.mcool: "
          f"{time.time()-t0:.1f}s")

    t0 = time.time()
    from matcha_tpu.apps.predict_multiway import run_predict_multiway
    q = tmp / "query.txt"
    lines = []
    for _ in range(1000):
        k = rng.integers(2, 6)
        nodes = rng.choice(np.arange(1, genome.num_nodes), k, replace=False)
        lines.append("\t".join(
            f"{genome.chrom_names[genome.node2chrom[n]]}:"
            f"{genome.node2start[n]}" for n in nodes))
    q.write_text("\n".join(lines) + "\n")
    run_predict_multiway(str(tmp / "Temp" / "model2load"), str(q),
                         str(tmp / "multiway.txt"))
    print(f"[predict_multiway] 1000 queries: {time.time()-t0:.1f}s")
    print(f"artifacts in {tmp}")


if __name__ == "__main__":
    main()
