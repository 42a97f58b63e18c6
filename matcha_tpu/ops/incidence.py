"""Device-resident incidence-structure ops (SpMM / SDDMM family).

The reference's only SpMM-shaped computation is the hypergraph-walk
preprocessing on scipy CSR (ref History_version/Code/random_walk_hyper.py:
84-141, SURVEY §2.12).  Here the incidence structure lives on device as a
padded hyperedge matrix — the TPU-native layout (SURVEY §7.1): fixed shapes,
gathers and segment reductions instead of CSR pointer chasing.

  PaddedIncidence: (E, k_max) int32 node ids, 0 = padding
  edge_gather_sum: Y[e] = sum_{v in e} X[v] * w_e        (SpMM  E x N · N x d)
  node_scatter_add: Z[v] = sum_{e : v in e} Y[e]         (SpMM  N x E · E x d)
  edge_sddmm: S[e] = sum_{u<v in e} <X[u], X[v]>         (hyperedge SDDMM)

All are XLA gather/scatter/segment-sum ops; XLA lowers them onto the TPU's
vector units and fuses the elementwise epilogues.  pair_cooccurrence backs
the hypergraph walks' first-order transition weights
(walks/hyper.py:cooccurrence_csr); the family also serves any future
message-passing model over the same incidence store.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class PaddedIncidence(NamedTuple):
    """Padded hyperedge members: (E, k_max) int32 node ids, 0 = pad."""
    members: jnp.ndarray

    @property
    def mask(self) -> jnp.ndarray:
        return self.members != 0

    @classmethod
    def from_ragged(cls, hyperedges, k_max: Optional[int] = None,
                    ) -> "PaddedIncidence":
        sizes = [len(e) for e in hyperedges]
        k_max = k_max or (max(sizes) if sizes else 1)
        out = np.zeros((len(hyperedges), k_max), dtype=np.int32)
        for i, e in enumerate(hyperedges):
            out[i, :len(e)] = np.asarray(e)
        return cls(members=jnp.asarray(out))

    @classmethod
    def from_csr(cls, flat: np.ndarray, offsets: np.ndarray,
                 k_max: Optional[int] = None) -> "PaddedIncidence":
        sizes = np.diff(offsets)
        k_max = k_max or int(sizes.max() if len(sizes) else 1)
        out = np.zeros((len(sizes), k_max), dtype=np.int32)
        for i in range(len(sizes)):
            out[i, :sizes[i]] = flat[offsets[i]:offsets[i + 1]]
        return cls(members=jnp.asarray(out))


def edge_gather_sum(inc: PaddedIncidence, node_feats: jnp.ndarray,
                    edge_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Y[e] = w_e * sum_{v in e} X[v].  node_feats: (N+1, d) with row 0
    zeros (the pad row makes masking free)."""
    gathered = node_feats[inc.members]            # (E, k, d); pads hit row 0
    y = gathered.sum(axis=1)
    if edge_weight is not None:
        y = y * edge_weight[:, None]
    return y


def node_scatter_add(inc: PaddedIncidence, edge_feats: jnp.ndarray,
                     num_nodes: int) -> jnp.ndarray:
    """Z[v] = sum_{e containing v} Y[e] -> (N+1, d); row 0 collects pads."""
    e, k = inc.members.shape
    flat_ids = inc.members.reshape(-1)
    flat_feats = jnp.repeat(edge_feats, k, axis=0)
    return jax.ops.segment_sum(flat_feats, flat_ids, num_segments=num_nodes + 1)


def pair_cooccurrence(inc: PaddedIncidence, edge_weight: jnp.ndarray,
                      num_nodes: int) -> jnp.ndarray:
    """Dense node-node co-occurrence weights
    ``W[u, v] = sum over edges e containing both u and v of w_e`` —
    the product ``EV^T diag(w) EV`` of the walk preprocessing
    (ref History_version/Code/random_walk_hyper.py:128-141, where
    w_e = 1/|e| gives the first-order transition weights).

    TPU-native form: ONE scatter-add over the E*k^2 per-edge member pairs
    (fixed shapes, no CSR pointer chasing), instead of a sparse SpMM.  The
    reference recomputes rows of this product per node across an 80-process
    pool; here the whole matrix materializes in one fused op.

    Returns (N+1, N+1) with pad row/col 0 and the diagonal zeroed.
    """
    m = inc.members                                  # (E, k), 0 = pad
    _, k = m.shape
    u = jnp.repeat(m, k, axis=1).reshape(-1)         # (E*k*k,)
    v = jnp.tile(m, (1, k)).reshape(-1)
    w = jnp.repeat(edge_weight, k * k)
    w = jnp.where((u == 0) | (v == 0) | (u == v), 0.0, w)
    n1 = num_nodes + 1
    # 2-D scatter, not a flattened u*n1+v key: the flat key overflows int32
    # (members' dtype) once n1 > ~46k (100 kb all-genome scale), silently
    # corrupting weights for callers that bypass cooccurrence_csr's size cap
    return jnp.zeros((n1, n1), edge_weight.dtype).at[u, v].add(w)


def edge_sddmm(inc: PaddedIncidence, node_feats: jnp.ndarray) -> jnp.ndarray:
    """S[e] = sum over unordered member pairs of <X[u], X[v]> — the sampled
    dense-dense product over the incidence sparsity (SDDMM).  Pad-safe via
    the zero row."""
    g = node_feats[inc.members]                   # (E, k, d)
    s = g.sum(axis=1)                             # (E, d)
    total = jnp.sum(s * s, axis=-1)               # ||sum||^2
    norms = jnp.sum(g * g, axis=-1).sum(axis=-1)  # sum ||x_i||^2
    return 0.5 * (total - norms)
