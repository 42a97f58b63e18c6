"""Generic (non-genomic) hypergraph datasets.

Capability parity with the legacy dataset-generic driver
(ref History_version/Code/main_drop.py:543-620): hypergraphs over typed node
spaces (``nums_type``), initial node features from the row-normalized
clique-expansion adjacency, per-type negative-sampling ranges
(``start_end_dict``), optional attribute matrices.

The genomic pipeline is the special case "node type == chromosome", so the
same model/sampler/trainer stack is reused: a typed node space is expressed
as a GenomeBins-shaped object (one "chromosome" per node type), and the
frozen tables are built from the hyperedge clique expansion instead of an
mcool contact matrix.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from matcha_tpu.genome import GenomeBins
from matcha_tpu.utils import edgelist_to_adjacency


def node_space_from_type_counts(type_names: Sequence[str],
                                counts: Sequence[int]) -> GenomeBins:
    """A typed node space as a GenomeBins: type t holds ``counts[t]`` nodes,
    ids contiguous, 1-based with 0 = padding — the ``nums_type`` /
    ``num_list`` structure of the legacy driver (ref main_drop.py:579-599)."""
    counts = [int(c) for c in counts]
    if any(c <= 0 for c in counts):
        # GenomeBins cannot express a 0-node chromosome (every chrom gets
        # >= 1 bin), which would add a phantom node the sampler could draw
        raise ValueError(f"every node type needs >= 1 node, got {counts}")
    # bins_per_chrom = ceil(size/res)+1; with res=1 and size=n-1 -> n bins
    sizes = [c - 1 for c in counts]
    return GenomeBins(list(type_names), sizes, resolution=1)


def adjacency_features(space: GenomeBins, flat: np.ndarray,
                       offsets: np.ndarray,
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Initial features from the hyperedge clique expansion
    (ref get_adjacency, main_drop.py:543-563): co-occurrence adjacency split
    into intra-type (feature blocks) and inter-type (recon targets)."""
    n = space.num_nodes
    adj = edgelist_to_adjacency(flat, offsets, n)
    t = space.node2chrom[1:]
    same = t[:, None] == t[None, :]
    intra = np.where(same, adj, 0.0).astype(np.float32)
    inter = np.where(same, 0.0, adj).astype(np.float32)
    return intra, inter


def load_npz_dataset(path: str) -> Dict:
    """Load the legacy ``train_data.npz``/``test_data.npz`` layout
    (ref main_drop.py:579-620): arrays ``train_data``/``test_data`` (ragged
    hyperedges, 0-based per-type... stored as tuples) and ``nums_type``."""
    data = np.load(path, allow_pickle=True)
    out = {k: data[k] for k in data.files}
    return out


def build_generic_problem(type_counts: Sequence[int], hyperedges,
                          dim: int = 64, n_head: int = 8,
                          type_names: Optional[Sequence[str]] = None,
                          seed: int = 0):
    """One-call setup for an arbitrary hypergraph: node space, frozen tables
    (clique-expansion features), model params, chromosome/type table.

    hyperedges: iterable of 1-based node-id lists (sorted, distinct).
    Returns (space, dims, params, frozen, chrom_table)."""
    import jax
    from matcha_tpu.models.hypersagnn import (ModelDims, build_frozen_tables,
                                              init_model)
    from matcha_tpu.sampler.negative import ChromTable

    if type_names is None:
        type_names = [f"type{i}" for i in range(len(type_counts))]
    space = node_space_from_type_counts(type_names, type_counts)

    hyperedges = [list(e) for e in hyperedges]   # tolerate generators
    sizes = [len(e) for e in hyperedges]
    flat = (np.concatenate([np.asarray(e) for e in hyperedges])
            .astype(np.int32) if sizes else np.zeros(0, np.int32))
    offsets = np.zeros(len(sizes) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])

    intra, inter = adjacency_features(space, flat, offsets)
    dims = ModelDims(dim=dim, n_head=n_head, num_chroms=space.num_chroms,
                     num_nodes=space.num_nodes)
    chrom_sizes = [int(e - s) for s, e in space.chrom_range]
    params = init_model(jax.random.PRNGKey(seed), dims, chrom_sizes)
    frozen = build_frozen_tables(space, intra, inter)
    return space, dims, params, frozen, ChromTable.from_genome(space)
