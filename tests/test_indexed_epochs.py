"""Indexed device-resident epochs (the shipped `fit` fast path).

Pins:
  * BucketedBatcher.next_epoch_indices draws the SAME ring state / row
    sequence as next_epoch (bitwise), including across a wrap+reshuffle
  * skip_epoch advances the ring exactly like a consumed epoch (resume
    fast-forward)
  * Trainer.fit(device_epochs="on") — pinned base buckets + on-device
    gathers — produces the SAME training trajectory as the host batcher
    path (device_epochs="off") for the same seed: final params match and
    per-epoch train/valid metrics match.  This is the round-4 "benched
    system == shipped system" contract (bench.py measures the same
    epoch_indexed_fn program fit runs).
"""

import numpy as np
import pytest

import jax

from matcha_tpu.data.batcher import BucketedBatcher
from matcha_tpu.genome import GenomeBins
from matcha_tpu.models.hypersagnn import (ModelDims, build_frozen_tables,
                                          init_model)
from matcha_tpu.sampler.bloom import build_bloom_dict
from matcha_tpu.sampler.negative import ChromTable
from matcha_tpu.train.runtime import Trainer, TrainSettings


def _buckets(rng, n, n_edges, k_list=(2, 3)):
    out = {}
    for k in k_list:
        e = np.stack([np.sort(rng.choice(np.arange(1, n + 1), k,
                                         replace=False))
                      for _ in range(n_edges)]).astype(np.int32)
        out[k] = (e, rng.random(n_edges).astype(np.float32) + 0.5)
    return out


def test_indices_match_next_epoch_across_wrap():
    rng = np.random.default_rng(3)
    buckets = _buckets(rng, 30, 50)
    a = BucketedBatcher(buckets, batch_size=8, num_batch_per_iter=3, seed=9)
    b = BucketedBatcher(buckets, batch_size=8, num_batch_per_iter=3, seed=9)
    # 6 epochs x 24 rows from a 50-row (duplicated to 100) ring: wraps twice
    for _ in range(6):
        host = a.next_epoch()
        idxs = b.next_epoch_indices()
        for k in host:
            e = b.base_edges[k][idxs[k].reshape(-1)].reshape(host[k][0].shape)
            w = b.base_weights[k][idxs[k].reshape(-1)].reshape(
                host[k][1].shape)
            np.testing.assert_array_equal(e, host[k][0])
            np.testing.assert_array_equal(w, host[k][1])


def test_skip_epoch_advances_ring_exactly():
    rng = np.random.default_rng(4)
    buckets = _buckets(rng, 30, 40)
    a = BucketedBatcher(buckets, batch_size=8, num_batch_per_iter=2, seed=5)
    b = BucketedBatcher(buckets, batch_size=8, num_batch_per_iter=2, seed=5)
    for _ in range(3):
        a.next_epoch()
        b.skip_epoch()
    for k in a.k_list:
        np.testing.assert_array_equal(a.next_epoch()[k][0],
                                      b.next_epoch()[k][0])


@pytest.mark.parametrize("with_blooms", [False, True])
def test_fit_indexed_matches_host_trajectory(with_blooms):
    rng = np.random.default_rng(11)
    genome = GenomeBins(["chr1", "chr2"], [20_000_000, 14_000_000], 1_000_000)
    n = genome.num_nodes
    intra = rng.random((n, n)).astype(np.float32)
    intra = intra + intra.T
    inter = rng.random((n, n)).astype(np.float32)
    dims = ModelDims(dim=16, n_head=4, num_chroms=2, num_nodes=n)
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    frozen = build_frozen_tables(genome, intra, inter)
    buckets = _buckets(rng, n, 60)
    test_b = _buckets(rng, n, 16)
    blooms = (build_bloom_dict({k: v[0] for k, v in buckets.items()})
              if with_blooms else None)
    settings = TrainSettings(alpha=1.0, beta=0.001, neg_num=2, max_trials=4,
                             extra_rounds=4)

    def run(mode):
        params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes)
        tr = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                     settings, blooms=blooms, seed=2)
        hist = tr.fit(buckets, test_b, epochs=3, batch_size=8,
                      num_batch_per_iter=2, log=lambda *_: None, seed=2,
                      device_epochs=mode)
        return tr.state.params, hist

    p_host, h_host = run("off")
    p_idx, h_idx = run("on")

    for a, b in zip(jax.tree_util.tree_leaves(p_host),
                    jax.tree_util.tree_leaves(p_idx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    for eh, ei in zip(h_host, h_idx):
        assert eh["train"]["bce"] == pytest.approx(ei["train"]["bce"],
                                                   rel=1e-5, abs=1e-7)
        assert eh["valid"]["bce"] == pytest.approx(ei["valid"]["bce"],
                                                   rel=1e-5, abs=1e-7)
        mh = eh["train"]["metrics"].get("all", {})
        mi = ei["train"]["metrics"].get("all", {})
        for key in mh:
            assert mh[key] == pytest.approx(mi[key], rel=1e-5, abs=1e-7), key


def test_fit_overlap_matches_serial_indexed(tmp_path, monkeypatch):
    """The overlapped fit pipeline (epoch N+1 dispatched before epoch N's
    eval/export/checkpoint host work — VERDICT r4 #5) must produce the
    IDENTICAL trajectory as the serial indexed path: same history metrics,
    same final params, same best checkpoint, same embeddings export.  The
    device program order per epoch (train scan, then eval scan) is the
    serial order, so only wall-clock placement of host work may differ."""
    rng = np.random.default_rng(21)
    genome = GenomeBins(["chr1", "chr2"], [20_000_000, 14_000_000],
                        1_000_000)
    n = genome.num_nodes
    intra = rng.random((n, n)).astype(np.float32)
    intra = intra + intra.T
    inter = rng.random((n, n)).astype(np.float32)
    dims = ModelDims(dim=16, n_head=4, num_chroms=2, num_nodes=n)
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    frozen = build_frozen_tables(genome, intra, inter)
    buckets = _buckets(rng, n, 60)
    test_b = _buckets(rng, n, 16)
    blooms = build_bloom_dict({k: v[0] for k, v in buckets.items()})
    settings = TrainSettings(alpha=1.0, beta=0.001, neg_num=2, max_trials=4,
                             extra_rounds=4)

    def run(overlap):
        monkeypatch.setenv("MATCHA_FIT_OVERLAP", "1" if overlap else "0")
        tag = "ov" if overlap else "ser"
        params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes)
        tr = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                     settings, blooms=blooms, seed=2)
        ck = str(tmp_path / f"ck_{tag}.pkl")
        emb = str(tmp_path / f"emb_{tag}.npy")
        hist = tr.fit(buckets, test_b, epochs=3, batch_size=8,
                      num_batch_per_iter=2, log=lambda *_: None, seed=2,
                      device_epochs="on", checkpoint_path=ck,
                      embeddings_path=emb)
        return tr.state.params, hist, ck, emb

    p_s, h_s, ck_s, emb_s = run(False)
    p_o, h_o, ck_o, emb_o = run(True)

    for a, b in zip(jax.tree_util.tree_leaves(p_s),
                    jax.tree_util.tree_leaves(p_o)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert len(h_s) == len(h_o) == 3
    for es, eo in zip(h_s, h_o):
        assert es["train"]["bce"] == eo["train"]["bce"]
        assert es["valid"]["bce"] == eo["valid"]["bce"]
        assert es["valid"]["metrics"] == eo["valid"]["metrics"]
    np.testing.assert_array_equal(np.load(emb_s), np.load(emb_o))
    from matcha_tpu.train.runtime import load_checkpoint
    for a, b in zip(jax.tree_util.tree_leaves(load_checkpoint(ck_s)),
                    jax.tree_util.tree_leaves(load_checkpoint(ck_o))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
