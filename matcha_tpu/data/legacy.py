"""Legacy (History_version) preprocessing surfaces.

Currently: the manuscript pipeline's low-frequency node filter
(ref: History_version/Code/process_SPRITE.py:93-161) — drop every node that
appears in <= ``min_freq`` clusters (frequency counted only over clusters of
size <= ``freq_count_cap``), renumber the survivors contiguously from 1,
rewrite every cluster with dropped members removed (keeping clusters that
retain >= 2 members), and remap the per-chromosome node ranges.

The reference does this with four Python dicts and three passes over the
ragged edge list.  Its renumbering collapses to one closed form: for any node
``n``, the number of surviving nodes with id < n, plus one — which equals
``cumsum(survived)[n]`` for survivors and ``cumsum(survived)[n] + 1`` for
dropped boundary nodes (the reference's ``node2newnode`` vs
``dropnode2newnode`` split, process_SPRITE.py:105-118).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class NodeFilterResult:
    flat: np.ndarray          # filtered CSR members (new node ids)
    offsets: np.ndarray       # filtered CSR offsets
    chrom_range: np.ndarray   # (C, 2) remapped [first, one_past_last]
    node2newnode: np.ndarray  # (old_node_num,) old id -> new id; 0 = dropped
    survived: np.ndarray      # (old_node_num,) bool per old node
    node_freq: np.ndarray     # (old_node_num,) counted frequency per old node

    @property
    def new_node_num(self) -> int:
        """One past the largest new node id (= reference's final ``count``)."""
        return int(self.survived.sum()) + 1


def filter_low_frequency_nodes(flat: np.ndarray, offsets: np.ndarray,
                               chrom_range: np.ndarray, *,
                               min_freq: int = 50,
                               freq_count_cap: int = 25) -> NodeFilterResult:
    """Drop nodes with cluster frequency <= ``min_freq`` and renumber.

    Matches History_version/Code/process_SPRITE.py:93-161: frequency is
    counted over clusters with <= ``freq_count_cap`` members (:95-99), the
    drop set is ``freq <= min_freq`` (:102), surviving nodes are renumbered
    1..S in ascending order (:109-117), clusters keep only surviving members
    and must retain >= 2 (:134-141), and chromosome range boundaries map
    through the renumbering with dropped boundaries snapping to the next
    surviving id (:143-156).
    """
    chrom_range = np.asarray(chrom_range, dtype=np.int64)
    node_num = int(chrom_range.max())          # one past the last old node id
    sizes = np.diff(offsets)

    keep_for_freq = np.repeat(sizes <= freq_count_cap, sizes)
    node_freq = np.bincount(flat[keep_for_freq], minlength=node_num + 1)

    survived = node_freq > min_freq
    survived[0] = False                         # 0 is the padding id
    survived[node_num:] = False                 # the one-past-end sentinel

    # survivors_upto[n] = number of surviving nodes with id <= n
    survivors_upto = np.cumsum(survived)
    node2newnode = np.where(survived, survivors_upto, 0).astype(np.int64)
    # boundary map: a dropped boundary snaps to 1 + (#survivors < n)
    boundary_id = survivors_upto + (~survived).astype(np.int64)
    new_chrom_range = boundary_id[chrom_range]

    # rewrite clusters: keep surviving members (already sorted / distinct,
    # and renumbering is monotone so they stay sorted), need >= 2 left
    member_kept = survived[flat]
    # segment-sum via cumsum difference (add.reduceat raises on a trailing
    # empty cluster — offsets[i] == len(flat) — and silently reads a
    # neighboring element for interior empty segments)
    csum = np.concatenate([[0], np.cumsum(member_kept.astype(np.int64))])
    new_sizes = csum[offsets[1:]] - csum[offsets[:-1]]
    edge_kept = new_sizes >= 2
    new_flat = node2newnode[flat[member_kept & np.repeat(edge_kept, sizes)]]
    new_flat = new_flat.astype(np.int32)
    kept_sizes = new_sizes[edge_kept]
    new_offsets = np.zeros(kept_sizes.shape[0] + 1, dtype=np.int64)
    np.cumsum(kept_sizes, out=new_offsets[1:])

    return NodeFilterResult(new_flat, new_offsets, new_chrom_range,
                            node2newnode, survived,
                            node_freq[:node_num].astype(np.int64))


def remap_node_dicts(result: NodeFilterResult, node2bin: dict,
                     node2chrom: dict) -> tuple[dict, dict, dict]:
    """Rebuild the bin/chrom dict artifacts for the surviving nodes
    (ref process_SPRITE.py:121-132): returns (bin2node, node2bin, node2chrom)
    keyed by the new ids."""
    new_node2bin, new_bin2node, new_node2chrom = {}, {}, {}
    for old, new in enumerate(result.node2newnode):
        if new == 0 or old not in node2bin:
            continue
        new_node2bin[int(new)] = node2bin[old]
        new_bin2node[node2bin[old]] = int(new)
        new_node2chrom[int(new)] = node2chrom[old]
    return new_bin2node, new_node2bin, new_node2chrom
