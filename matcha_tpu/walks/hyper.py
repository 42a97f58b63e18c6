"""True hypergraph random walks over the incidence structure.

Semantics of the reference's ``random_walk_hyper.py`` (ref History_version/
Code/random_walk_hyper.py):

  * incidence matrices EV (E x N), VE, and degree-normalized
    EV_over_delta = diag(1/sqrt(|e|)) EV  (ref build_graph :84-126)
  * first-order weight src->dst:
        ff(src,dst) = sum_{e ∋ src,dst} 1/|e|          (the VE_od @ EV_od SpMM,
        ref get_first_order_part :128-141)
    prob ∝ ff / sqrt(node_degree(dst))
  * second-order (src -> dst -> x) over x in nbr(dst)
    (ref get_alias_n2n_2nd :222-254), with weight_1st=1, weight_degree=-0.5:
        pp = 1/q
        pp /= p  if x co-occurs in a hyperedge with some e ∋ {src,dst}
                 (i.e. x belongs to at least one hyperedge containing both)
        pp *= q  if x == src or x adjacent to src
        prob ∝ pp * ff(dst,x) * node_degree(x)^-0.5
  * walks as in the clique walker; node ids here are 0-based (the reference
    shifts its 1-based hyperedges down by one, ref toint :436-437)

The first-order SpMM runs ON DEVICE as one scatter-add over padded member
pairs (ops.incidence.pair_cooccurrence; the reference recomputes rows per
node across an 80-process pool), falling back to scipy above the dense-buffer
cap; tabulation is vectorized per (src,dst) with CSR set intersections;
simulation reuses the flat alias walker.
"""

from __future__ import annotations

import numpy as np
from scipy.sparse import csr_matrix

from matcha_tpu.walks.alias import build_alias_tables


def incidence_matrices(num_nodes: int, hyperedges):
    """EV (E x N) binary incidence + degree-normalized variant."""
    indptr = np.zeros(len(hyperedges) + 1, dtype=np.int64)
    np.cumsum([len(e) for e in hyperedges], out=indptr[1:])
    indices = np.concatenate([np.asarray(e) for e in hyperedges]) \
        if len(hyperedges) else np.zeros(0, np.int64)
    data = np.ones(len(indices), dtype=np.float32)
    EV = csr_matrix((data, indices, indptr),
                    shape=(len(hyperedges), num_nodes))
    sizes = np.asarray(EV.sum(axis=1)).reshape(-1)
    inv_sqrt = 1.0 / np.sqrt(np.maximum(sizes, 1))
    EV_od = csr_matrix(EV.multiply(inv_sqrt[:, None]))
    return EV, EV_od


# dense (N+1)^2 f32 device buffer cap for the on-device co-occurrence path
_DEVICE_COOC_MAX_BYTES = 2 << 30


def cooccurrence_csr(num_nodes: int, hyperedges, backend: str = "auto",
                     ev_matrices=None):
    """First-order walk weights ``W[u,v] = sum_{e ∋ u,v} 1/|e|`` (diagonal
    dropped) as scipy CSR — the ``VE_od @ EV_od`` product of
    ref random_walk_hyper.py:128-141.

    backend:
      "device" — one scatter-add over padded member pairs on the
        accelerator (ops.incidence.pair_cooccurrence), then a single
        transfer of the dense result; at walk scale (≈3k nodes @ 1 Mb) this
        replaces the scipy SpMM entirely.
      "scipy"  — host CSR product.
      "auto"   — device when the dense (N+1)^2 buffer is < 2 GB, else scipy.
    """
    if backend == "auto":
        dense_bytes = 4 * (num_nodes + 1) ** 2
        backend = "device" if dense_bytes < _DEVICE_COOC_MAX_BYTES else "scipy"
    if backend == "device":
        import jax.numpy as jnp
        from matcha_tpu.ops.incidence import (PaddedIncidence,
                                              pair_cooccurrence)
        # walk node ids are 0-based (ref toint :436-437); the padded
        # incidence reserves id 0 for padding -> shift up by one
        shifted = [np.asarray(e, dtype=np.int64) + 1 for e in hyperedges]
        inc = PaddedIncidence.from_ragged(shifted)
        w_e = jnp.asarray(
            [1.0 / max(len(e), 1) for e in hyperedges], dtype=jnp.float32)
        W = np.asarray(pair_cooccurrence(inc, w_e, num_nodes))[1:, 1:]
        W = csr_matrix(W)
    else:
        # callers that already built the incidence matrices pass them in —
        # at scipy-fallback scale (num_nodes past the 2 GB dense cap) a
        # second full CSR construction is the setup bottleneck
        EV_od = (ev_matrices[1] if ev_matrices is not None
                 else incidence_matrices(num_nodes, hyperedges)[1])
        W = (EV_od.T @ EV_od).tocsr()
        W.setdiag(0)
    W.eliminate_zeros()
    W.sort_indices()
    return W


def hypergraph_walks(num_nodes: int, hyperedges, *, p: float = 2,
                     q: float = 0.25, num_walks: int = 10,
                     walk_length: int = 80, seed: int = 0,
                     weight_backend: str = "auto") -> np.ndarray:
    """-> (num_nodes * num_walks, walk_length) walks (0-based node ids)."""
    rng = np.random.default_rng(seed)
    ev_mats = incidence_matrices(num_nodes, hyperedges)
    EV = ev_mats[0]
    VE = EV.T.tocsr()
    node_degree = np.asarray(EV.sum(axis=0)).reshape(-1)

    # ff = VE_od @ EV_od : (N, N) node-node weights, diagonal removed —
    # computed on device by default (see cooccurrence_csr)
    W = cooccurrence_csr(num_nodes, hyperedges, backend=weight_backend,
                         ev_matrices=ev_mats)

    # first-order tables
    dists, values = [], []
    for v in range(num_nodes):
        s, e = W.indptr[v], W.indptr[v + 1]
        nbrs = W.indices[s:e]
        w = W.data[s:e] / np.sqrt(np.maximum(node_degree[nbrs], 1))
        tot = w.sum()
        dists.append(w / tot if tot > 0 else w)
        values.append(nbrs)
    first = build_alias_tables(dists, values)

    # second-order tables per directed pair (src, dst)
    VE_indptr, VE_indices = VE.indptr, VE.indices        # node -> hyperedges
    EV_indptr, EV_indices = EV.indptr, EV.indices        # hyperedge -> nodes
    dists2, values2, keys2 = [], [], []
    for dst in range(num_nodes):
        s, e = W.indptr[dst], W.indptr[dst + 1]
        dst_nbr = W.indices[s:e]
        if len(dst_nbr) == 0:
            continue
        ff_dst = W.data[s:e]
        deg_term = node_degree[dst_nbr] ** -0.5
        e_dst = VE_indices[VE_indptr[dst]:VE_indptr[dst + 1]]
        for src in dst_nbr:                  # directed (src -> dst)
            e_src = VE_indices[VE_indptr[src]:VE_indptr[src + 1]]
            e1 = np.intersect1d(e_dst, e_src, assume_unique=False)
            # members of any hyperedge containing both src and dst
            if len(e1):
                members = np.unique(np.concatenate(
                    [EV_indices[EV_indptr[i]:EV_indptr[i + 1]] for i in e1]))
            else:
                members = np.zeros(0, dtype=np.int64)
            pp = np.full(len(dst_nbr), 1.0 / q)
            pp[np.isin(dst_nbr, members)] /= p          # ref :231-232
            src_nbr = W.indices[W.indptr[src]:W.indptr[src + 1]]
            back = np.isin(dst_nbr, src_nbr) | (dst_nbr == src)
            pp[back] *= q                                # ref :234-238
            pr = pp * ff_dst * deg_term                  # ref :246-249
            tot = pr.sum()
            dists2.append(pr / tot if tot > 0 else pr)
            values2.append(dst_nbr)
            keys2.append(src * num_nodes + dst)
    keys2 = np.asarray(keys2, dtype=np.int64)
    order = np.argsort(keys2)
    second = build_alias_tables([dists2[i] for i in order],
                                [values2[i] for i in order])
    edge_keys = keys2[order]

    # lockstep simulation — the same walker as the clique path
    from matcha_tpu.walks.alias import simulate_second_order_walks
    return simulate_second_order_walks(num_nodes, first, second, edge_keys,
                                       num_walks, walk_length, rng)
