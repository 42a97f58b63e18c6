"""Closed-form all-pairs hyperedge scoring (the denoise fast path).

For a PAIR (k=2) with the diag (self-excluding) mask, the softmax row for
position i has exactly one unmasked key — the other member — so attention
weights are exactly [0, 1] and the "dynamic" embedding of position i is a
function of node j alone.  The whole model therefore factorizes into
per-node tables:

    h_n   = tanh(next_w(H[n] + attr_n))                 (the pre-attention x)
    A'_n  = fc1(concat_heads(W_v ln_v(h_n)))            (dynamic before pff)
    A_n   = LN1(pff_n1(A'_n))                           (per-position dynamic)
    S_n   = LN2(h_n)                                    (per-position static)
    logit(i,j) = mean over the two positions of  w·(A_other − S_self)² + b

which expands to rank-1 outer sums plus one (N, d)x(d, N) matmul:

    α_n = w·A_n²,  σ_n = w·S_n²,  M = (w ∘ A) Sᵀ
    logit(i,j) = b + ½(α_i + α_j + σ_i + σ_j) − M[i,j] − M[j,i]

Exact (eval mode) — pinned against the batched forward by
tests/test_pairwise_fast.py.  This turns denoise_contact's per-chromosome
all-pairs scoring (ref Code/denoise_contact.py:147-158, millions of model
forwards) into two MXU matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from matcha_tpu.models.hypersagnn import (FrozenTables, ModelDims,
                                          encode_node_table)
from matcha_tpu.models.modules import feed_forward, layer_norm, linear, pff, tanh


def _node_tables(params, frozen: FrozenTables, dims: ModelDims):
    """-> (A (N+1, d), S (N+1, d)) per-node dynamic/static tables."""
    table = encode_node_table(params, frozen, dims, train=False)
    attr = linear(params["attr_nn"], frozen.attr_table.astype(jnp.float32))
    h = tanh(feed_forward(params["next_w"], table + attr))      # (N+1, d)

    mha = params["encoder"]["mha"]
    v = layer_norm(mha["ln_v"], h) @ mha["wv"].astype(h.dtype)  # (N+1, h*dk)
    a_raw = linear(mha["fc1"], v)                               # (N+1, d)
    a = layer_norm(params["ln_dynamic"],
                   pff(params["encoder"]["pff_n1"], a_raw, residual=True))
    s = layer_norm(params["ln_static"], h)
    return a, s


def pairwise_logits(params, frozen: FrozenTables, dims: ModelDims,
                    nodes: np.ndarray) -> jnp.ndarray:
    """(M, M) raw logits for every pair of the given node ids (i != j);
    the diagonal holds the (meaningless) self-pair value."""
    a, s = _node_tables(params, frozen, dims)
    w = params["pff_classifier"]["layers"][0]["w"][:, 0]        # (d,)
    b = params["pff_classifier"]["layers"][0]["b"][0]
    nodes = jnp.asarray(nodes)
    a = a[nodes]
    s = s[nodes]
    alpha = (a * a) @ w                                          # (M,)
    sigma = (s * s) @ w
    m = (a * w) @ s.T                                            # (M, M)
    half = 0.5 * (alpha + sigma)
    return b + half[:, None] + half[None, :] - m - m.T


def pairwise_proba_matrix(params, frozen, dims, genome, chrom_id: int,
                          ) -> np.ndarray:
    """Sigmoid pair probabilities for one chromosome's full bin range."""
    s, e = genome.chrom_range[chrom_id]
    logits = pairwise_logits(params, frozen, dims, np.arange(s, e))
    return np.asarray(1.0 / (1.0 + np.exp(-np.asarray(logits,
                                                      dtype=np.float64))))
