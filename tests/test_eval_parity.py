"""Exact eval-loop parity vs the imported PyTorch reference.

Pins the MIXED-POOL eval semantics (ref Code/main.py:200-258): identical
weights on both sides (copy_params_to_torch), the identical drawn subsample
(eval_epoch's `indices` hook == the reference's sync_shuffle slice), the
stage-1 rejection semantics (empty dicts -> negatives are positive copies,
the ref while loop at Code/main.py:392 exits immediately) so BOTH eval
loops are fully deterministic — per-row predictions and the weighted BCE
must match to float tolerance.  test_model_parity pins the forward; this
pins the loop AROUND it: pooled mixed draw, batch padding, per-row
negatives, label/weight assembly, per-batch loss averaging."""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from matcha_tpu.genome import GenomeBins
from matcha_tpu.models.hypersagnn import (ModelDims, build_frozen_tables,
                                          init_model)
from matcha_tpu.sampler.negative import ChromTable
from matcha_tpu.train.runtime import Trainer, TrainSettings
from reference_harness import build_torch_reference, copy_params_to_torch

DIM, HEADS = 16, 4


def _torch_eval_mixed(model, rows, weights, indices, bs, L, neg_num=3):
    """The reference eval loop exactly (ref Code/main.py:212-247) with the
    empty-dict negative path (copies) inlined.  rows: list of variable-length
    member lists (the mixed pool); indices: the drawn subsample."""
    import torch.nn.functional as F
    n_batches = len(indices) // bs
    preds, bces = [], []
    with torch.no_grad():
        for i in range(n_batches):
            idx = indices[i * bs:(i + 1) * bs]
            batch_rows = [rows[j] for j in idx]
            lb = max(len(r) for r in batch_rows)
            assert lb == L, "test construction: every batch has a max-k row"
            pos = np.zeros((bs, lb), np.int64)
            for r_i, r in enumerate(batch_rows):
                pos[r_i, :len(r)] = r
            # empty rejection dicts: negatives == positives (tile layout,
            # matching _eval_mixed_loss's r % B row mapping)
            neg = np.tile(pos, (neg_num, 1))
            x = torch.from_numpy(np.concatenate([pos, neg]))
            y = torch.cat([torch.ones(bs, 1), torch.zeros(bs * neg_num, 1)])
            w = torch.cat([torch.from_numpy(
                weights[idx].astype(np.float32)).reshape(-1, 1),
                torch.ones(bs * neg_num, 1)])
            logit, _ = model(x, return_recon=True)
            bces.append(float(F.binary_cross_entropy_with_logits(
                logit, y, weight=w)))
            preds.append(torch.sigmoid(logit).numpy().reshape(-1))
    return np.concatenate(preds), float(np.mean(bces))


def test_eval_loop_matches_reference_exactly():
    rng = np.random.default_rng(8)
    genome = GenomeBins(["chr1", "chr2", "chr3"],
                        [19_500_000, 12_200_000, 8_000_000], 1_000_000)
    n = genome.num_nodes
    intra = rng.random((n, n)).astype(np.float32)
    intra = intra + intra.T
    inter = rng.random((n, n)).astype(np.float32)
    inter = inter + inter.T
    np.fill_diagonal(inter, 0)
    dims = ModelDims(dim=DIM, n_head=HEADS, num_chroms=genome.num_chroms,
                     num_nodes=n)
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes)
    frozen = build_frozen_tables(genome, intra, inter)

    def draw_rows(b, k):
        return np.stack([np.sort(rng.choice(np.arange(1, n + 1), k,
                                            replace=False))
                         for _ in range(b)]).astype(np.int32)

    n2, n3 = 96, 64
    test_buckets = {2: (draw_rows(n2, 2),
                        rng.uniform(0.5, 3.0, n2).astype(np.float32)),
                    3: (draw_rows(n3, 3),
                        rng.uniform(0.5, 3.0, n3).astype(np.float32))}
    trainer = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                      TrainSettings(alpha=1.0, beta=0.001), blooms=None)

    # draw: 3 k=2 rows then 1 k=3 row, repeating, so every 16-row batch
    # contains a max-size row (pool order is sorted-by-k: 0..95 are k=2)
    idx2 = rng.permutation(n2)
    idx3 = rng.permutation(n3) + n2
    mixed, i2, i3 = [], 0, 0
    while i2 < n2 or i3 < n3:
        for _ in range(3):
            if i2 < n2:
                mixed.append(idx2[i2])
                i2 += 1
        if i3 < n3:
            mixed.append(idx3[i3])
            i3 += 1
    indices = np.asarray(mixed, np.int64)

    bs = 16
    ours = trainer.eval_epoch(test_buckets, batch_size=bs,
                              max_samples=len(indices), indices=indices,
                              return_pred=True)

    tmodel = build_torch_reference(genome, intra, inter, DIM, HEADS)
    copy_params_to_torch(trainer.state.params, tmodel, genome.num_chroms)
    rows = ([list(map(int, r)) for r in test_buckets[2][0]]
            + [list(map(int, r)) for r in test_buckets[3][0]])
    weights = np.concatenate([test_buckets[2][1], test_buckets[3][1]])
    t_pred, t_bce = _torch_eval_mixed(tmodel, rows, weights,
                                      indices[: (len(indices) // bs) * bs],
                                      bs, L=3)

    np.testing.assert_allclose(ours["pred"], t_pred, rtol=2e-4, atol=2e-5)
    assert abs(ours["bce"] - t_bce) < 2e-5
