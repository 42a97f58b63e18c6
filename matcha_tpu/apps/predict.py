"""Shared batched inference over a trained model bundle.

Replaces the reference's per-app ``predict`` loops
(ref Code/denoise_contact.py:76-88, Code/predict_multiway.py:74-87): inputs
are bucketed by hyperedge size (static shapes, no padding — consistent with
training; the reference pads, but its attention ignores pad masking anyway,
see models/modules.mha_dynamic) and scored with a jitted forward in fixed-size
chunks.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tpu.models.hypersagnn import (ModelDims, encode_node_table,
                                          forward)


@partial(jax.jit, static_argnames=("dims",))
def _score(params, frozen, dims, node_table, x):
    # module-level jit: callers invoking predict_logits repeatedly (e.g.
    # run_denoise, once per chromosome) hit the compile cache on repeated
    # shapes instead of retracing a fresh closure every call
    return forward(params, frozen, dims, x, node_table=node_table)


def predict_logits(params, frozen, dims: ModelDims,
                   samples: Sequence[Sequence[int]],
                   batch_size: int = 10_000) -> np.ndarray:
    """Score a ragged list of hyperedges -> (N,) raw logits (sigmoid is the
    caller's choice, matching the reference apps)."""
    samples = list(samples)
    n = len(samples)
    out = np.zeros(n, dtype=np.float32)
    node_table = encode_node_table(params, frozen, dims, train=False)

    def score(x):
        return _score(params, frozen, dims, node_table, x)

    by_size: Dict[int, List[int]] = {}
    for i, s in enumerate(samples):
        by_size.setdefault(len(s), []).append(i)

    for k, idx in by_size.items():
        arr = np.asarray([samples[i] for i in idx], dtype=np.int32)
        for lo in range(0, len(arr), batch_size):
            chunk = arr[lo:lo + batch_size]
            pad = 0
            if len(chunk) < batch_size and len(arr) > batch_size:
                # pad the tail chunk to the steady-state shape (one compile)
                pad = batch_size - len(chunk)
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
            logits = np.asarray(score(jnp.asarray(chunk))).reshape(-1)
            if pad:
                logits = logits[:-pad]
            out[np.asarray(idx[lo:lo + batch_size])] = logits
    return out


def predict_proba(params, frozen, dims, samples,
                  batch_size: int = 10_000) -> np.ndarray:
    logits = predict_logits(params, frozen, dims, samples, batch_size)
    return 1.0 / (1.0 + np.exp(-logits))
