"""Genome binning parity with the reference's build_node_dict
(ref Code/process.py:10-39)."""

import math

import numpy as np

from matcha_tpu.genome import GenomeBins


def reference_node_dict(chrom_list, sizes, res):
    """Direct reimplementation of the reference loop for oracle comparison."""
    bin2node, node2chrom, chrom_range = {}, {}, []
    count = 1
    for j, chrom in enumerate(chrom_list):
        size = sizes[j]
        max_bin_chrom = math.ceil(size / res)
        temp = [count]
        for i in range(max_bin_chrom + 1):
            bin2node[f"{chrom}:{i * res}"] = count
            node2chrom[count] = j
            count += 1
        temp.append(count)
        chrom_range.append(temp)
    return bin2node, node2chrom, chrom_range


def test_matches_reference_semantics(tiny_genome):
    g = tiny_genome
    b2n, n2c, cr = reference_node_dict(g.chrom_names, g.chrom_sizes,
                                       g.resolution)
    assert g.chrom_range.tolist() == cr
    assert g.bin2node_dict() == b2n
    assert g.node2chrom_dict() == n2c
    assert g.node_num == max(b2n.values()) + 1


def test_coords_to_nodes(tiny_genome):
    g = tiny_genome
    chroms = np.array([0, 1, 2, 0])
    coords = np.array([0, 1_500_000, 19_999_998, 999_999])
    nodes = g.coords_to_nodes(chroms, coords)
    assert nodes[0] == g.node_for("chr1", 0) == 1
    assert nodes[1] == g.node_for("chr2", 1_500_000)
    assert nodes[3] == 1  # floors into bin 0
    # chromosome boundaries are contiguous, ids start at 1
    assert g.chrom_range[0, 0] == 1
    assert (g.chrom_range[1:, 0] == g.chrom_range[:-1, 1]).all()


def test_chrom_sizes_file(tmp_path, tiny_genome):
    p = tmp_path / "sizes.txt"
    lines = [f"{c}\t{s}" for c, s in
             zip(tiny_genome.chrom_names, tiny_genome.chrom_sizes)]
    lines.append("chrM\t16000")  # extra chromosome ignored
    p.write_text("\n".join(lines) + "\n")
    g = GenomeBins.from_chrom_sizes_file(str(p), tiny_genome.chrom_names,
                                         tiny_genome.resolution)
    assert g.chrom_range.tolist() == tiny_genome.chrom_range.tolist()


def test_save_load_roundtrip(tmp_path, tiny_genome):
    tiny_genome.save(str(tmp_path))
    g = GenomeBins.load(str(tmp_path))
    assert g.chrom_range.tolist() == tiny_genome.chrom_range.tolist()
    assert (g.node2chrom == tiny_genome.node2chrom).all()
    # reference-layout artifacts exist
    for name in ["chrom_range.npy", "bin2node.npy", "node2bin.npy",
                 "node2chrom.npy"]:
        assert (tmp_path / name).exists()
