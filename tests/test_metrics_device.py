"""Device metrics (sorts + segment ops) must reproduce sklearn exactly —
including midranks over tied prediction blocks (saturated sigmoids tie at
exactly 1.0 in f32) and average-precision's collapse of tied thresholds."""

import numpy as np
import pytest

from matcha_tpu.train.metrics import (device_metrics_fn, metrics_from_device,
                                      size_stratified_metrics)


def _compare(y, sizes, preds, atol=2e-5):
    import jax
    host = size_stratified_metrics(np.tile(y, preds.shape[0]),
                                   preds.reshape(-1),
                                   np.tile(sizes, preds.shape[0]))
    f = device_metrics_fn(y, sizes)
    vals = jax.device_get(f(preds))
    dev = metrics_from_device(vals, f.group_sizes, preds.shape[0])
    assert set(host) == set(dev)
    for g in host:
        for key in ("auroc", "auprc", "acc"):
            hv, dv = host[g][key], dev[g][key]
            if np.isnan(hv):
                assert np.isnan(dv), (g, key)
            else:
                assert hv == pytest.approx(dv, abs=atol), (g, key, hv, dv)
        assert host[g]["n"] == dev[g]["n"]


def test_random_predictions_match_sklearn():
    rng = np.random.default_rng(0)
    P = 512
    y = np.concatenate([np.ones(P // 4), np.zeros(3 * P // 4)])
    sizes = np.tile(np.repeat([2, 3, 4, 5], P // 16), 4)
    preds = rng.random((3, P)).astype(np.float32)
    _compare(y, sizes, preds)


def test_tied_blocks_match_sklearn():
    """Saturated predictions: large exact-tie blocks at 0.0/0.5/1.0."""
    rng = np.random.default_rng(1)
    P = 384
    y = (rng.random(P) < 0.3).astype(np.float32)
    sizes = np.repeat([2, 3, 4], P // 3)
    base = rng.choice([0.0, 0.25, 0.5, 0.75, 1.0], size=(2, P))
    preds = base.astype(np.float32)
    _compare(y, sizes, preds)


def test_single_class_group_is_nan():
    y = np.ones(64, np.float32)              # no negatives anywhere
    sizes = np.repeat([2, 3], 32)
    preds = np.random.default_rng(2).random((1, 64)).astype(np.float32)
    _compare(y, sizes, preds)


def test_large_volume_close():
    """Bench-scale volume: f32 rank sums must stay within 1e-5 of f64
    sklearn (tree-reduction error analysis in the docstring)."""
    rng = np.random.default_rng(3)
    P = 8192
    y = np.concatenate([np.ones(P // 4), np.zeros(3 * P // 4)])
    sizes = np.tile(np.repeat([2, 3, 4, 5], P // 16), 4)
    preds = rng.random((40, P)).astype(np.float32)   # 327k rows
    _compare(y, sizes, preds, atol=5e-5)


def test_fit_with_device_metrics_matches_host(tmp_path, monkeypatch):
    """End-to-end: a fit whose train metrics are computed on device must
    report the same history as the sklearn path (checkpoint selection uses
    eval metrics, which stay host-side either way)."""
    import jax
    from matcha_tpu.data.batcher import BucketedBatcher  # noqa: F401
    from matcha_tpu.genome import GenomeBins
    from matcha_tpu.models.hypersagnn import (ModelDims, build_frozen_tables,
                                              init_model)
    from matcha_tpu.sampler.bloom import build_bloom_dict
    from matcha_tpu.sampler.negative import ChromTable
    from matcha_tpu.train.runtime import Trainer, TrainSettings

    rng = np.random.default_rng(5)
    genome = GenomeBins(["chr1", "chr2"], [20_000_000, 14_000_000],
                        1_000_000)
    n = genome.num_nodes
    intra = rng.random((n, n)).astype(np.float32)
    intra = intra + intra.T
    inter = rng.random((n, n)).astype(np.float32)
    dims = ModelDims(dim=16, n_head=4, num_chroms=2, num_nodes=n)
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    frozen = build_frozen_tables(genome, intra, inter)

    def buckets(n_edges):
        out = {}
        for k in (2, 3):
            e = np.stack([np.sort(rng.choice(np.arange(1, n + 1), k,
                                             replace=False))
                          for _ in range(n_edges)]).astype(np.int32)
            out[k] = (e, rng.random(n_edges).astype(np.float32) + 0.5)
        return out

    tr_b, te_b = buckets(60), buckets(16)
    blooms = build_bloom_dict({k: v[0] for k, v in tr_b.items()})
    settings = TrainSettings(alpha=1.0, beta=0.001, neg_num=2, max_trials=4,
                             extra_rounds=4)

    def run(force_dev):
        params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes)
        tr = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                     settings, blooms=blooms, seed=2)
        if force_dev:
            monkeypatch.setattr(Trainer, "_use_device_metrics",
                                lambda self: True)
        else:
            monkeypatch.setattr(Trainer, "_use_device_metrics",
                                lambda self: False)
        return tr.fit(tr_b, te_b, epochs=2, batch_size=8,
                      num_batch_per_iter=2, log=lambda *_: None, seed=2,
                      device_epochs="on")

    h_host = run(False)
    h_dev = run(True)
    for eh, ed in zip(h_host, h_dev):
        assert eh["train"]["bce"] == ed["train"]["bce"]
        mh, md = eh["train"]["metrics"], ed["train"]["metrics"]
        assert set(mh) == set(md)
        for g in mh:
            for key in ("auroc", "auprc", "acc", "n"):
                assert mh[g][key] == pytest.approx(md[g][key], abs=2e-5), \
                    (g, key)
        assert eh["valid"]["metrics"] == ed["valid"]["metrics"]
