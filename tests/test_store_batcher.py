"""HyperedgeStore labeling/splitting and BucketedBatcher ring semantics."""

import numpy as np
import pytest

from matcha_tpu.data.batcher import BucketedBatcher
from matcha_tpu.data.store import HyperedgeStore, quantile_transform


def make_kmer_data(rng, n2=400, n3=300):
    k2 = np.sort(rng.integers(1, 200, (n2, 2)), axis=1).astype(np.int32)
    k3 = np.sort(rng.integers(1, 200, (n3, 3)), axis=1).astype(np.int32)
    f2 = rng.integers(2, 50, n2)
    f3 = rng.integers(2, 50, n3)
    return {2: (k2, f2), 3: (k3, f3)}


def test_store_split_and_weights(rng):
    data = make_kmer_data(rng)
    store = HyperedgeStore(data, quantile_cutoff_for_positive=0.6,
                           quantile_cutoff_for_unlabel=0.4, neg_num=3,
                           split=0.8, seed=0)
    # quantile cutoffs: positives ⊂ unlabeled
    for k in (2, 3):
        n_pos = len(store.train[k][0]) + len(store.test[k][0])
        assert 0 < n_pos <= len(store.unlabeled[k]) <= len(data[k][0])
    # split roughly 80/20 overall
    n_train = sum(len(v[0]) for v in store.train.values())
    n_test = sum(len(v[0]) for v in store.test.values())
    assert abs(n_train / (n_train + n_test) - 0.8) < 0.02
    # weights mean-normalized * neg_num over the combined positive set
    # (ref Code/main.py:594-595)
    all_w = np.concatenate([store.train[k][1] for k in (2, 3)]
                           + [store.test[k][1] for k in (2, 3)])
    assert abs(all_w.mean() - 3.0) < 1e-5
    # edges/weights stay aligned through the split
    qt = {k: quantile_transform(data[k][1]) for k in (2, 3)}
    lookup = {}
    for k in (2, 3):
        for row, w in zip(data[k][0], qt[k]):
            lookup[tuple(map(int, row)) + (k,)] = w
    scale = 3.0 / np.concatenate(
        [qt[k][qt[k] > 0.6] for k in (2, 3)]).mean()
    for k in (2, 3):
        e, w = store.train[k]
        for row, wi in zip(e[:20], w[:20]):
            expect = lookup[tuple(map(int, row)) + (k,)] * scale
            assert abs(wi - expect) < 1e-4


def test_batcher_covers_all_and_reshuffles(rng):
    edges = np.unique(
        np.sort(rng.integers(1, 100, (80, 2)), axis=1), axis=0)[:50]
    edges = edges.astype(np.int32)
    w = rng.random(len(edges)).astype(np.float32)
    b = BucketedBatcher({2: (edges, w)}, batch_size=8, num_batch_per_iter=3,
                        seed=0)
    # bucket was duplicated until > 24 (ref Code/Modules.py:638-641)
    assert len(b.base_edges[2]) > 24
    epoch1 = b.next_epoch()[2]
    assert epoch1[0].shape == (3, 8, 2)
    assert epoch1[1].shape == (3, 8)
    # weights stay aligned to their edges
    pair_to_w = {tuple(map(int, e)): float(wi)
                 for e, wi in zip(edges, w)}
    for eb, wb in zip(epoch1[0].reshape(-1, 2), epoch1[1].reshape(-1)):
        assert abs(pair_to_w[tuple(map(int, eb))] - wb) < 1e-6
    # successive epochs eventually wrap and reshuffle without repeats
    seen = set()
    for _ in range(10):
        ep = b.next_epoch()[2]
        seen.update(map(tuple, ep[0].reshape(-1, 2).tolist()))
    assert seen == set(map(tuple, edges.tolist()))


def test_batcher_empty_bucket_raises():
    with pytest.raises(ValueError):
        BucketedBatcher({2: (np.zeros((0, 2), np.int32),
                             np.zeros(0, np.float32))}, 4, 2)
