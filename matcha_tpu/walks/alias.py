"""Flat-array alias method for batched walk simulation.

The reference builds per-node/per-edge alias tables as Python dict-of-tuples
and draws one sample per Python call (ref History_version/Code/random_walk.py:
119-162).  Here all tables live in three flat arrays (probabilities, alias
indices, neighbor ids) addressed by an offsets vector, so ONE vectorized draw
advances every walker simultaneously — the host-side analogue of a gather
kernel, and the layout a future Pallas walker would use directly.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np


def alias_setup(probs: np.ndarray):
    """Vose alias construction for one distribution (semantics of ref
    alias_setup, History_version/Code/random_walk.py:119-149)."""
    k = len(probs)
    q = np.asarray(probs, dtype=np.float64) * k
    J = np.zeros(k, dtype=np.int64)
    smaller = [i for i in range(k) if q[i] < 1.0]
    larger = [i for i in range(k) if q[i] >= 1.0]
    while smaller and larger:
        small = smaller.pop()
        large = larger.pop()
        J[small] = large
        q[large] = q[large] + q[small] - 1.0
        (smaller if q[large] < 1.0 else larger).append(large)
    return J, q


class AliasTables(NamedTuple):
    """Many alias tables in flat storage."""
    offsets: np.ndarray    # (T+1,) start of table t
    prob: np.ndarray       # (sum sizes,) acceptance thresholds
    alias: np.ndarray      # (sum sizes,) alias indices (local)
    value: np.ndarray      # (sum sizes,) the sampled payload (neighbor ids)

    def draw(self, table_ids: np.ndarray, rng: np.random.Generator,
             ) -> np.ndarray:
        """Vectorized draw: one sample from each listed table."""
        table_ids = np.asarray(table_ids)
        start = self.offsets[table_ids]
        size = self.offsets[table_ids + 1] - start
        kk = np.floor(rng.random(len(table_ids)) * size).astype(np.int64)
        flat = start + kk
        accept = rng.random(len(table_ids)) < self.prob[flat]
        choice = np.where(accept, kk, self.alias[flat])
        return self.value[start + choice]

    def size(self, table_ids: np.ndarray) -> np.ndarray:
        table_ids = np.asarray(table_ids)
        return self.offsets[table_ids + 1] - self.offsets[table_ids]


def build_alias_tables(dists: Sequence, values: Sequence) -> AliasTables:
    """dists[t]: probability vector of table t; values[t]: payloads."""
    sizes = [len(d) for d in dists]
    offsets = np.zeros(len(dists) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    total = int(offsets[-1])
    prob = np.zeros(total)
    alias = np.zeros(total, dtype=np.int64)
    value = np.zeros(total, dtype=np.int64)
    for t, (d, v) in enumerate(zip(dists, values)):
        if len(d) == 0:
            continue
        J, q = alias_setup(np.asarray(d, dtype=np.float64))
        s, e = offsets[t], offsets[t + 1]
        prob[s:e] = q
        alias[s:e] = J
        value[s:e] = v
    return AliasTables(offsets, prob, alias, value)
