"""Outlier-member detection: which member of a hyperedge doesn't belong?

Working re-design of the legacy reference's outlier evaluation
(ref History_version/Code/utils.py:184-233 generate_outlier_part /
check_outlier).  Note the legacy path is broken in the reference: its
``Classifier.forward`` accepts ``get_outlier`` but ignores it and returns
plain probabilities (History_version/Code/Modules.py:314-356), so
``check_outlier`` compares probabilities against position indices.  Here the
per-position classifier scores (the signal before the masked mean) rank
members by anomaly.

Evaluation protocol (parity with generate_outlier_part): corrupt one position
of each real hyperedge with a random node that forms no known pair with the
remaining members, then measure how often that position ranks in the top-k
most-anomalous.
"""

from __future__ import annotations

from typing import Set, Tuple

import jax.numpy as jnp
import numpy as np

from matcha_tpu.models.hypersagnn import forward


def per_position_scores(params, frozen, dims, x: np.ndarray) -> np.ndarray:
    """(B, L) per-position raw scores; LOWER = more anomalous (the score
    feeds the hyperedge logit via the masked mean)."""
    _, pos = forward(params, frozen, dims, jnp.asarray(x),
                     return_positions=True)
    return np.asarray(pos)


def rank_outliers(params, frozen, dims, x: np.ndarray, k: int = 3,
                  ) -> np.ndarray:
    """(B, k) position indices sorted most-anomalous-first (pads excluded)."""
    scores = per_position_scores(params, frozen, dims, x)
    scores = np.where(x == 0, np.inf, scores)   # never pick pads
    return np.argsort(scores, axis=1)[:, :k]


def generate_outliers(edges: np.ndarray, known_pairs: Set[Tuple[int, int]],
                      num_nodes: int, rng: np.random.Generator,
                      per_edge: int = 20, max_trials: int = 100,
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Corrupt one random position per copy of each hyperedge with a node
    forming no known pair with the rest (ref generate_outlier_part
    semantics, generalized from its per-node-type ranges to any node)."""
    inputs, points = [], []
    for e in edges:
        point = int(rng.integers(0, len(e)))
        count = 0
        for _ in range(max_trials):
            if count >= per_edge:
                break
            j = int(rng.integers(1, num_nodes + 1))
            # check against the REMAINING members only: the replaced one
            # leaves the edge, so a pair with it alone is irrelevant
            if any((j, n) in known_pairs or (n, j) in known_pairs
                   for idx, n in enumerate(e) if idx != point):
                continue
            temp = np.copy(e)
            temp[point] = j
            inputs.append(temp)
            points.append(point)
            count += 1
    if not inputs:
        return np.zeros((0, edges.shape[1]), np.int32), np.zeros(0, np.int64)
    inputs, index = np.unique(np.asarray(inputs), axis=0, return_index=True)
    return inputs.astype(np.int32), np.asarray(points)[index]


def outlier_hit_rate(params, frozen, dims, inputs: np.ndarray,
                     points: np.ndarray, k: int = 3) -> np.ndarray:
    """Cumulative top-1..top-k hit rates of the corrupted position
    (ref check_outlier's cumsum/size report)."""
    ranks = rank_outliers(params, frozen, dims, inputs, k=k)
    hits = ranks == points[:, None]
    return hits.mean(axis=0).cumsum()
