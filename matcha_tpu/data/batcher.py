"""Size-bucketed hyperedge batcher.

TPU-native replacement for the reference's ``DataGenerator``
(ref: Code/Modules.py:620-692): per hyperedge size k an independent shuffled
ring buffer; small buckets are logically duplicated so every epoch draws
``num_batch_per_iter * batch_size`` samples *per size*; the ring wraps and
reshuffles on exhaustion.

The key layout difference: instead of returning a ragged mixed-size list that
the trainer re-pads per batch, `next_epoch` returns per-k arrays of static
shape ``(num_batch_per_iter, batch_size, k)`` — one fixed-shape bucket per k,
so every jitted train step sees identical shapes (no recompiles, no padding).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

Buckets = Dict[int, Tuple[np.ndarray, np.ndarray]]


class BucketedBatcher:
    def __init__(self, buckets: Buckets, batch_size: int,
                 num_batch_per_iter: int, seed: int = 0):
        self.batch_size = int(batch_size)
        self.num_batch_per_iter = int(num_batch_per_iter)
        self.rng = np.random.default_rng(seed)
        self.k_list = sorted(buckets.keys())
        self.edges: Dict[int, np.ndarray] = {}
        self.weights: Dict[int, np.ndarray] = {}
        self.pointer: Dict[int, int] = {}

        need = self.num_batch_per_iter * self.batch_size
        for k in self.k_list:
            e, w = buckets[k]
            e = np.asarray(e, dtype=np.int32)
            w = np.asarray(w, dtype=np.float32)
            if len(e) == 0:
                raise ValueError(f"empty bucket for k={k}")
            # duplicate small buckets until they cover one epoch draw
            # (ref Code/Modules.py:638-641)
            while len(e) <= need:
                e = np.concatenate([e, e])
                w = np.concatenate([w, w])
            self.edges[k], self.weights[k] = e, w
            self._shuffle(k)
            self.pointer[k] = 0

    def _shuffle(self, k: int) -> None:
        idx = self.rng.permutation(len(self.edges[k]))
        self.edges[k] = self.edges[k][idx]
        self.weights[k] = self.weights[k][idx]

    def next_epoch(self) -> Buckets:
        """Draw one epoch: per k, arrays of shape (num_batch, batch, k) and
        (num_batch, batch).  Wraps + reshuffles per ring (ref :653-681)."""
        need = self.num_batch_per_iter * self.batch_size
        out: Buckets = {}
        for k in self.k_list:
            p = self.pointer[k]
            n = len(self.edges[k])
            if p + need <= n:
                e = self.edges[k][p:p + need]
                w = self.weights[k][p:p + need]
                self.pointer[k] = p + need
            else:
                head_e, head_w = self.edges[k][p:n], self.weights[k][p:n]
                self._shuffle(k)
                left = need - (n - p)
                e = np.concatenate([head_e, self.edges[k][:left]])
                w = np.concatenate([head_w, self.weights[k][:left]])
                self.pointer[k] = left
            out[k] = (e.reshape(self.num_batch_per_iter, self.batch_size, k),
                      w.reshape(self.num_batch_per_iter, self.batch_size))
        return out
