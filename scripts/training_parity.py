"""Small-scale training-curve parity: our JAX framework vs the PyTorch
reference, trained end-to-end on the SAME synthetic fixture with the SAME
two-stage schedule, labels, splits, and rejection sets (VERDICT #7).

The torch side imports the reference's Modules from /root/reference/Code and
drives them with the reference's own training-step semantics
(ref Code/main.py:37-58,119-197,361-459,637-679): per-k batches, CPU
rejection negative sampling against the unlabeled member sets, weighted
BCE-with-logits * alpha + recon * beta, AdamW, stage 1 (alpha=0, beta=1,
empty rejection dicts) then stage 2 (fresh AdamW, alpha=1, beta=0.001).
Nothing is copied into the framework — the reference runs as an oracle.

Both sides evaluate identically: same held-out positives, negatives drawn
against the same membership structure, sklearn AUROC/AUPRC per size
(train/metrics.py == ref Code/utils.py:32-72).

Usage:  python scripts/training_parity.py [--stage2-epochs 12] [--steps 30]
Prints a side-by-side table; record results in BASELINE.md.
"""

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
sys.path.insert(0, os.path.join(HERE, "..", "tests"))


def build_fixture(tmp, seed=3):
    """Synthetic planted-community dataset -> ingested temp_dir + store."""
    from synth import make_synthetic_dataset, write_chrom_sizes
    from matcha_tpu.config import Config
    from matcha_tpu.genome import GenomeBins
    from matcha_tpu.pipeline import run_generate_kmers, run_process

    rng = np.random.default_rng(seed)
    genome = GenomeBins(["chr1", "chr2"], [40_000_000, 28_000_000], 1_000_000)
    cluster_path, mcool_path = make_synthetic_dataset(
        tmp, genome, rng, n_clusters=6000)
    config = Config(
        cluster_path=cluster_path, mcool_path=mcool_path,
        resolution=1_000_000, chrom_list=genome.chrom_names,
        chrom_size=write_chrom_sizes(tmp, genome),
        temp_dir=str(tmp / "Temp"), max_cluster_size=25,
        min_distance=0, kmer_size=[2, 3], min_freq_cutoff=2,
        quantile_cutoff_for_positive=0.6, quantile_cutoff_for_unlabel=0.4,
        embed_dim=32, n_head=4, batch_size=96, seed=7)
    run_process(config)
    run_generate_kmers(config)
    return genome, config


# --------------------------------------------------------------- torch side
def torch_train_reference(genome, config, store, *, stage1_epochs,
                          stage2_epochs, steps_per_epoch, batch, seed=11):
    import torch
    import torch.nn.functional as F
    from baseline_torch import reference_generate_negative
    from reference_harness import build_torch_reference
    from matcha_tpu.data.mcool import load_contacts
    from matcha_tpu.train.metrics import size_stratified_metrics

    torch.manual_seed(seed)
    np.random.seed(seed)
    import random as _random
    _random.seed(seed)
    intra, inter = load_contacts(config.temp_dir)
    model = build_torch_reference(genome, intra, inter,
                                  dim=config.embed_dim, n_head=config.n_head)
    rng = np.random.default_rng(seed)
    ks = sorted(store.train.keys())
    empty_sets = {i: set() for i in range(max(ks) + 1)}
    member_sets = {i: set() for i in range(max(ks) + 1)}
    for k in ks:
        member_sets[k] = set(map(tuple, store.unlabeled[k].tolist()))

    def run_stage(alpha, beta, epochs, sets):
        opt = torch.optim.AdamW(model.parameters(), lr=1e-3)  # ref :630
        model.train()
        for _ in range(epochs):
            for _ in range(steps_per_epoch):
                for k in ks:
                    e, w = store.train[k]
                    idx = rng.integers(0, len(e), batch)
                    pos = e[idx].astype(np.int64)
                    neg = reference_generate_negative(
                        pos, sets, genome, min_dis=config.min_distance,
                        neg_num=config.neg_num)
                    x = torch.from_numpy(np.concatenate([pos, neg]))
                    y = torch.cat([torch.ones(len(pos), 1),
                                   torch.zeros(len(neg), 1)])
                    ww = torch.cat([torch.from_numpy(w[idx].astype(
                        np.float32)).reshape(-1, 1),
                        torch.ones(len(neg), 1)])
                    pred, recon = model(x, return_recon=True)
                    loss = (alpha * F.binary_cross_entropy_with_logits(
                        pred, y, weight=ww) + beta * recon)
                    opt.zero_grad()
                    loss.backward()
                    opt.step()

    t0 = time.time()
    # stage 1: recon only, empty rejection dicts (ref :589,637-643)
    run_stage(0.0, 1.0, stage1_epochs, empty_sets)
    # stage 2: fresh AdamW, classification (ref :671-679)
    run_stage(1.0, 0.001, stage2_epochs, member_sets)
    elapsed = time.time() - t0

    # eval: held-out positives + fresh negatives vs the SAME member sets
    model.eval()
    preds, ys, sizes = [], [], []
    with torch.no_grad():
        for k in ks:
            e, w = store.test[k]
            take = min(len(e), 5000 // len(ks) * 4)
            pos = e[rng.permutation(len(e))[:take]].astype(np.int64)
            neg = reference_generate_negative(
                pos, member_sets, genome, min_dis=config.min_distance,
                neg_num=config.neg_num)
            x = torch.from_numpy(np.concatenate([pos, neg]))
            p = torch.sigmoid(model(x)).numpy().reshape(-1)
            preds.append(p)
            ys.append(np.concatenate([np.ones(len(pos)), np.zeros(len(neg))]))
            sizes.append(np.full(len(x), k, dtype=np.int32))
    metrics = size_stratified_metrics(np.concatenate(ys),
                                      np.concatenate(preds),
                                      np.concatenate(sizes))
    return metrics, elapsed


# ----------------------------------------------------------------- JAX side
def jax_train(config, *, stage1_epochs, stage2_epochs, steps_per_epoch):
    from matcha_tpu.pipeline import run_train
    t0 = time.time()
    import dataclasses
    _, history, store = run_train(
        dataclasses.replace(config, num_batch_per_iter=steps_per_epoch),
        log=lambda *_: None,
        stage1_epochs=stage1_epochs, stage2_epochs=stage2_epochs)
    return history[-1]["valid"]["metrics"], time.time() - t0, store


def fmt(m):
    keys = ["all"] + sorted(k for k in m if k != "all")
    return "  ".join(f"{k}: auroc {m[k]['auroc']:.3f} "
                     f"auprc {m[k]['auprc']:.3f}" for k in keys)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage1-epochs", type=int, default=2)
    ap.add_argument("--stage2-epochs", type=int, default=12)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=96)
    args = ap.parse_args()

    tmp = Path(tempfile.mkdtemp(prefix="matcha_parity_"))
    genome, config = build_fixture(tmp)

    jm, jt, store = jax_train(config, stage1_epochs=args.stage1_epochs,
                              stage2_epochs=args.stage2_epochs,
                              steps_per_epoch=args.steps)
    print(f"jax   ({jt:6.1f}s): {fmt(jm)}")

    tm, tt = torch_train_reference(
        genome, config, store, stage1_epochs=args.stage1_epochs,
        stage2_epochs=args.stage2_epochs, steps_per_epoch=args.steps,
        batch=args.batch)
    print(f"torch ({tt:6.1f}s): {fmt(tm)}")

    gap = {k: jm[k]["auroc"] - tm[k]["auroc"] for k in jm if k in tm}
    print(json.dumps({"auroc_gap_jax_minus_torch":
                      {str(k): round(v, 4) for k, v in gap.items()},
                      "jax_wall_s": round(jt, 1),
                      "torch_wall_s": round(tt, 1)}))


if __name__ == "__main__":
    main()
