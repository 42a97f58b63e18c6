"""Hyperedge store: quantile labeling, positive/unlabeled selection, splits.

Mirrors the label/weight preparation of the reference driver
(ref: Code/main.py:548-603,646-667):

  * per k independently: frequency -> sklearn QuantileTransformer
    (n_quantiles=1000, uniform) -> weight in [0,1]
  * positives: weight > quantile_cutoff_for_positive
  * unlabeled (negative-sampler rejection set): weight > quantile_cutoff_for_unlabel
  * positive weights mean-normalized over all sizes combined, then * neg_num
  * 80/20 random train/test split over the combined positive set

Unlike the reference's ragged mixed-size lists, edges live in per-k buckets of
static shape ``(N_k, k)`` — the TPU-native layout (fixed shapes per bucket, no
padding waste, no recompilation).
"""

from __future__ import annotations

import os
from typing import Dict, Sequence, Tuple

import numpy as np
from sklearn.preprocessing import QuantileTransformer


def quantile_transform(freqs: np.ndarray) -> np.ndarray:
    """Frequency -> uniform quantile weight, exactly as the reference
    (ref Code/main.py:555)."""
    qt = QuantileTransformer(n_quantiles=1000, output_distribution="uniform")
    return qt.fit_transform(
        np.asarray(freqs, dtype=np.float32).reshape(-1, 1)).reshape(-1)


Bucketed = Dict[int, Tuple[np.ndarray, np.ndarray]]   # k -> (edges, weights)


def split_by_frequency_bands(kmers: np.ndarray, freqs: np.ndarray,
                             bands: Sequence[Tuple[int, int]],
                             ) -> Dict[Tuple[int, int], np.ndarray]:
    """Split k-mers into frequency bands [lo, hi) (the legacy drivers train
    on banded tuple files [3,5),[5,8),[8,12),[12,inf) —
    ref History_version/Code/main_SPRITE.py:580-591).  Pass hi=-1 for an
    open upper band."""
    out = {}
    for lo, hi in bands:
        mask = freqs >= lo if hi < 0 else (freqs >= lo) & (freqs < hi)
        out[(lo, hi)] = kmers[mask]
    return out


class HyperedgeStore:
    """Per-k positive hyperedges + weights, train/test split, unlabeled set."""

    def __init__(self, kmer_data: Dict[int, Tuple[np.ndarray, np.ndarray]],
                 *, quantile_cutoff_for_positive: float,
                 quantile_cutoff_for_unlabel: float, neg_num: int,
                 split: float = 0.8, seed: int = 0):
        self.k_list = sorted(kmer_data.keys())
        rng = np.random.default_rng(seed)

        pos_edges, pos_weights, pos_sizes = [], [], []
        unlabeled: Dict[int, np.ndarray] = {}
        for k in self.k_list:
            kmers, freqs = kmer_data[k]
            kmers = np.asarray(kmers, dtype=np.int32)
            w = quantile_transform(freqs)
            pos_mask = w > quantile_cutoff_for_positive
            unl_mask = w > quantile_cutoff_for_unlabel
            pos_edges.append(kmers[pos_mask])
            pos_weights.append(w[pos_mask].astype(np.float32))
            pos_sizes.append(np.full(pos_mask.sum(), k, dtype=np.int32))
            unlabeled[k] = kmers[unl_mask]

        weights = np.concatenate(pos_weights) if pos_weights else np.zeros(0, np.float32)
        # mean-normalize over ALL sizes combined, then * neg_num (ref :594-595)
        if weights.size:
            weights = weights / weights.mean() * neg_num
        sizes = np.concatenate(pos_sizes) if pos_sizes else np.zeros(0, np.int32)

        # 80/20 split over the combined set (ref :598-603)
        n = weights.size
        index = rng.permutation(n)
        cut = int(split * n)
        train_idx, test_idx = index[:cut], index[cut:]

        self.train: Bucketed = self._bucket(pos_edges, weights, sizes, train_idx)
        self.test: Bucketed = self._bucket(pos_edges, weights, sizes, test_idx)
        self.unlabeled: Dict[int, np.ndarray] = unlabeled

    def _bucket(self, pos_edges: Sequence[np.ndarray], weights: np.ndarray,
                sizes: np.ndarray, idx: np.ndarray) -> Bucketed:
        # reconstruct flat per-row access into the per-k arrays
        out: Bucketed = {}
        offsets = np.cumsum([0] + [len(e) for e in pos_edges])
        for ki, k in enumerate(self.k_list):
            lo, hi = offsets[ki], offsets[ki + 1]
            rows = idx[(idx >= lo) & (idx < hi)]
            out[k] = (pos_edges[ki][rows - lo], weights[rows])
        return out

    # --------------------------------------------------------------- utility
    def train_sizes(self) -> Dict[int, int]:
        return {k: len(v[0]) for k, v in self.train.items()}

    def save(self, temp_dir: str) -> None:
        os.makedirs(temp_dir, exist_ok=True)
        for k in self.k_list:
            for name, bucket in (("train", self.train), ("test", self.test)):
                e, w = bucket[k]
                np.save(os.path.join(temp_dir, f"{name}_{k}_edges.npy"), e)
                np.save(os.path.join(temp_dir, f"{name}_{k}_weights.npy"), w)
            np.save(os.path.join(temp_dir, f"unlabeled_{k}_edges.npy"),
                    self.unlabeled[k])

    @classmethod
    def from_temp_dir(cls, temp_dir: str, k_list: Sequence[int], *,
                      quantile_cutoff_for_positive: float,
                      quantile_cutoff_for_unlabel: float, neg_num: int,
                      split: float = 0.8, seed: int = 0) -> "HyperedgeStore":
        """Build from reference-layout k-mer artifacts
        (``all_<k>_counter.npy`` etc., ref Code/main.py:552-553)."""
        data = {}
        for k in k_list:
            kmers = np.load(os.path.join(temp_dir, f"all_{k}_counter.npy")
                            ).astype(np.int32)
            freqs = np.load(os.path.join(temp_dir, f"all_{k}_freq_counter.npy")
                            ).astype(np.float32)
            data[int(k)] = (kmers, freqs)
        return cls(data,
                   quantile_cutoff_for_positive=quantile_cutoff_for_positive,
                   quantile_cutoff_for_unlabel=quantile_cutoff_for_unlabel,
                   neg_num=neg_num, split=split, seed=seed)
