"""Synthetic dataset generator for end-to-end tests (SURVEY §4: a
CPU-runnable fixture with a synthetic .clusters/.mcool, chr1-scale)."""

import numpy as np


def make_synthetic_dataset(tmp_path, genome, rng, n_clusters=3000,
                           n_communities=6):
    """Clusters drawn from planted node communities (so k-mers repeat and a
    classifier can beat chance), plus an mcool with matching block structure."""
    res = genome.resolution
    n = genome.num_nodes
    comm_of_node = rng.integers(0, n_communities, n + 1)

    lines = []
    for i in range(n_clusters):
        c = rng.integers(0, n_communities)
        members = np.flatnonzero(comm_of_node[1:] == c) + 1
        m = int(rng.integers(2, 6))
        if len(members) < m:
            continue
        chosen = rng.choice(members, m, replace=False)
        parts = []
        for node in chosen:
            ci = genome.node2chrom[node]
            start = genome.node2start[node] + int(rng.integers(0, res))
            parts.append(f"{genome.chrom_names[ci]}:{start}")
        lines.append(f"cl{i}\t" + "\t".join(parts))
    cluster_path = tmp_path / "synth.clusters"
    cluster_path.write_text("\n".join(lines) + "\n")

    # mcool: block-structured contacts from the same communities
    import h5py
    mcool_path = tmp_path / "synth.mcool"
    same = comm_of_node[1:, None] == comm_of_node[None, 1:]
    base = rng.random((n, n)) * np.where(same, 3.0, 0.3)
    base = np.triu(base + base.T, 0)
    ii, jj = np.nonzero(base > 0.4)
    with h5py.File(mcool_path, "w") as f:
        grp = f.create_group("resolutions").create_group(str(res))
        bins = grp.create_group("bins")
        chrom_idx, starts = [], []
        for c in range(genome.num_chroms):
            s, e = genome.chrom_range[c]
            chrom_idx += [c] * (e - s)
            starts += (np.arange(e - s) * res).tolist()
        bins.create_dataset("chrom", data=np.array(chrom_idx))
        bins.create_dataset("start", data=np.array(starts))
        bins.create_dataset("end", data=np.array(starts) + res)
        chroms = grp.create_group("chroms")
        chroms.create_dataset(
            "name", data=[c.encode() for c in genome.chrom_names])
        pix = grp.create_group("pixels")
        pix.create_dataset("bin1_id", data=ii)
        pix.create_dataset("bin2_id", data=jj)
        pix.create_dataset("count", data=base[ii, jj])
    return str(cluster_path), str(mcool_path)


def write_chrom_sizes(tmp_path, genome):
    p = tmp_path / "sizes.txt"
    p.write_text("".join(f"{c}\t{s}\n" for c, s in
                         zip(genome.chrom_names, genome.chrom_sizes)))
    return str(p)
