"""Legacy-capability tests: simple/hard negative mixing, regress task mode,
trainable-table embedding mode, outlier detection."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matcha_tpu.apps.outlier import (generate_outliers, outlier_hit_rate,
                                     per_position_scores, rank_outliers)
from matcha_tpu.genome import GenomeBins
from matcha_tpu.models.hypersagnn import (ModelDims, build_frozen_tables,
                                          encode_node_table, forward,
                                          init_model)
from matcha_tpu.sampler.bloom import build_bloom
from matcha_tpu.sampler.negative import ChromTable, sample_negatives
from matcha_tpu.train.runtime import Trainer, TrainSettings


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    genome = GenomeBins(["chr1", "chr2"], [24_000_000, 15_000_000], 1_000_000)
    n = genome.num_nodes
    intra = rng.random((n, n)).astype(np.float32)
    intra = intra + intra.T
    inter = rng.random((n, n)).astype(np.float32)
    dims = ModelDims(dim=16, n_head=4, num_chroms=2, num_nodes=n)
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    frozen = build_frozen_tables(genome, intra, inter)
    return genome, dims, chrom_sizes, frozen


def test_simple_hard_mixing(problem, rng):
    genome, dims, chrom_sizes, frozen = problem
    table = ChromTable.from_genome(genome)
    pos = []
    while len(pos) < 128:
        r = np.sort(rng.integers(1, genome.num_nodes, 3))
        if (np.diff(r) > 0).all():
            pos.append(r)
    pos = np.asarray(pos, dtype=np.int32)
    bloom = build_bloom(pos)
    # hard_ratio=0 -> every negative is a wholly random hyperedge;
    # chromosome multiset is NOT preserved for many rows
    neg = np.asarray(sample_negatives(
        jax.random.PRNGKey(0), jnp.asarray(pos), table, 0, bloom,
        neg_num=2, hard_ratio=0.0))
    pos_chroms = np.sort(genome.node2chrom[np.tile(pos, (2, 1))], axis=1)
    neg_chroms = np.sort(genome.node2chrom[neg], axis=1)
    assert (pos_chroms != neg_chroms).any()
    # structural constraints still hold
    assert (np.diff(neg, axis=1) > 0).all()
    # hard_ratio=1.0 behaves like the default (chromosomes preserved)
    neg_h = np.asarray(sample_negatives(
        jax.random.PRNGKey(0), jnp.asarray(pos), table, 0, bloom,
        neg_num=2, hard_ratio=1.0))
    np.testing.assert_array_equal(
        np.sort(genome.node2chrom[np.tile(pos, (2, 1))], 1),
        np.sort(genome.node2chrom[neg_h], 1))


def test_table_embedding_mode(problem):
    genome, dims, chrom_sizes, frozen = problem
    init = np.full((genome.num_nodes, dims.dim), 0.5, np.float32)
    params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes,
                        embedding_mode="table", table_init=init)
    table = encode_node_table(params, frozen, dims)
    assert table.shape == (genome.num_nodes + 1, dims.dim)
    np.testing.assert_allclose(np.asarray(table[0]), 0.0)
    np.testing.assert_allclose(np.asarray(table[1:]), 0.5)
    x = jnp.asarray([[1, 5, 9], [2, 4, 0]], dtype=jnp.int32)
    out, recon = forward(params, frozen, dims, x, return_recon=True,
                         key=jax.random.PRNGKey(1), train=True)
    assert out.shape == (2, 1)
    assert float(recon) == 0.0


def test_regress_mode_trains(problem, rng):
    genome, dims, chrom_sizes, frozen = problem
    params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes)
    buckets = {}
    edges = []
    while len(edges) < 64:
        r = np.sort(rng.integers(1, genome.num_nodes, 2))
        if r[0] != r[1]:
            edges.append(r)
    buckets[2] = (np.asarray(edges, np.int32),
                  rng.random(64).astype(np.float32) + 0.5)
    settings = TrainSettings(alpha=1.0, beta=0.0, neg_num=1,
                             task_mode="regress")
    trainer = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                      settings, blooms={2: build_bloom(buckets[2][0])})
    from matcha_tpu.data.batcher import BucketedBatcher
    batcher = BucketedBatcher(buckets, batch_size=16, num_batch_per_iter=4)
    r = trainer.train_epoch(batcher)
    assert np.isfinite(r["bce"])


def _reference_node_filter(edge_list, chrom_range, node2bin, node2chrom):
    """Literal dict/loop translation of the reference's low-frequency node
    drop + renumber (History_version/Code/process_SPRITE.py:93-161), used as
    the oracle (the script itself has hardcoded absolute paths)."""
    node_freq = np.zeros((np.max(chrom_range)))
    for e in edge_list:
        if len(e) > 25:
            continue
        for n in e:
            node_freq[n] += 1
    drop_list = set(np.where(node_freq <= 50)[0].tolist())
    node2newnode, dropnode2newnode = {}, {}
    count = 1
    n = 0
    for n in range(np.max(chrom_range)):
        if n == 0:
            continue
        elif n in drop_list:
            dropnode2newnode[n] = count
        else:
            node2newnode[n] = count
            count += 1
    dropnode2newnode[n + 1] = count
    new_node2bin, new_bin2node, newnode2chrom = {}, {}, {}
    for node in node2bin:
        if node in node2newnode:
            new_node2bin[node2newnode[node]] = node2bin[node]
            new_bin2node[node2bin[node]] = node2newnode[node]
            newnode2chrom[node2newnode[node]] = node2chrom[node]
    new_final = []
    for e in edge_list:
        temp = [node2newnode[x] for x in e if x in node2newnode]
        if len(temp) >= 2:
            new_final.append(temp)
    new_chrom_range = []
    for v in chrom_range:
        new_chrom_range.append(
            [node2newnode.get(v[0], dropnode2newnode.get(v[0])),
             node2newnode.get(v[1], dropnode2newnode.get(v[1]))])
    return (new_final, np.array(new_chrom_range), new_bin2node, new_node2bin,
            newnode2chrom)


def test_legacy_node_filter_matches_reference_semantics(rng):
    from matcha_tpu.data.legacy import (filter_low_frequency_nodes,
                                        remap_node_dicts)
    genome = GenomeBins(["chr1", "chr2", "chr3"],
                        [40_000_000, 25_000_000, 18_000_000], 1_000_000)
    n = genome.num_nodes
    # heavy-tailed node usage so a sizable fraction lands at freq <= 50;
    # a few oversized clusters exercise the freq_count_cap branch
    popular = rng.permutation(np.arange(1, n + 1))[:n // 2]
    edge_list = []
    for _ in range(4000):
        k = int(rng.integers(2, 6))
        e = sorted(set(rng.choice(popular, k, replace=False).tolist()))
        if len(e) >= 2:
            edge_list.append(e)
    # mid-tier: every node gets ~25-75 extra pair occurrences so many land
    # right around the freq<=50 cutoff
    for _ in range(int(n * 25)):
        e = sorted(set(rng.choice(np.arange(1, n + 1), 2,
                                  replace=False).tolist()))
        if len(e) >= 2:
            edge_list.append(e)
    for _ in range(30):
        e = sorted(set(rng.choice(np.arange(1, n + 1), 30,
                                  replace=False).tolist()))
        edge_list.append(e)

    ref_final, ref_range, ref_b2n, ref_n2b, ref_n2c = _reference_node_filter(
        edge_list, genome.chrom_range, genome.node2bin_dict(),
        genome.node2chrom_dict())

    sizes = [len(e) for e in edge_list]
    flat = np.concatenate([np.asarray(e) for e in edge_list]).astype(np.int32)
    offsets = np.zeros(len(sizes) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    res = filter_low_frequency_nodes(flat, offsets, genome.chrom_range)

    ours_final = [res.flat[res.offsets[i]:res.offsets[i + 1]].tolist()
                  for i in range(len(res.offsets) - 1)]
    assert ours_final == ref_final
    np.testing.assert_array_equal(res.chrom_range, ref_range)
    b2n, n2b, n2c = remap_node_dicts(res, genome.node2bin_dict(),
                                     genome.node2chrom_dict())
    assert b2n == ref_b2n and n2b == ref_n2b and n2c == ref_n2c
    assert res.new_node_num == int(ref_range.max())


def test_parse_contact_pairs_matches_reference_loop(rng, tmp_path):
    """Oracle: the exact per-row rules of ref process_SPRITE.py:164-202 —
    chrom-list filter, NaN skip, exact-bin membership, symmetric double-add
    (2w on the diagonal)."""
    from matcha_tpu.data.legacy import parse_contact_pairs
    genome = GenomeBins(["chr1", "chr2"], [5_000_000, 3_000_000], 1_000_000)
    rows = []
    for _ in range(300):
        c1 = rng.choice(["chr1", "chr2", "chrX"])   # chrX: outside the list
        c2 = rng.choice(["chr1", "chr2"])
        s1 = int(rng.integers(0, 8)) * 500_000      # half off-bin-start
        s2 = int(rng.integers(0, 8)) * 1_000_000    # some past the chrom end
        w = float(rng.standard_normal())
        if rng.random() < 0.1:
            w = np.nan
        rows.append((c1, s1, c2, s2, w))
    rows.append(("chr1", 1_000_000, "chr1", 1_000_000, 2.5))  # diagonal quirk
    path = tmp_path / "SPRITE_contact.txt"
    with open(path, "w") as f:
        f.write("chrom1\tstart1\tchrom2\tstart2\tbalanced\n")
        for c1, s1, c2, s2, w in rows:
            f.write(f"{c1}\t{s1}\t{c2}\t{s2}\t{w}\n")

    # reference loop, verbatim semantics
    bin2node = genome.bin2node_dict()
    n = genome.num_nodes
    intra_ref = np.zeros((n, n))
    inter_ref = np.zeros((n, n))
    for c1, s1, c2, s2, w in rows:
        if c1 not in ["chr1", "chr2"] or c2 not in ["chr1", "chr2"]:
            continue
        if np.isnan(w):
            continue
        b1, b2 = f"{c1}:{s1}", f"{c2}:{s2}"
        if b1 in bin2node and b2 in bin2node:
            n1, n2 = bin2node[b1] - 1, bin2node[b2] - 1
            adj = intra_ref if c1 == c2 else inter_ref
            adj[n1, n2] += w
            adj[n2, n1] += w

    intra, inter = parse_contact_pairs(str(path), genome)
    np.testing.assert_allclose(intra, intra_ref)
    np.testing.assert_allclose(inter, inter_ref)

    # diagonal quirk in isolation: a self-pair lands 2w
    solo = tmp_path / "solo.txt"
    solo.write_text("chrom1\tstart1\tchrom2\tstart2\tbalanced\n"
                    "chr1\t1000000\tchr1\t1000000\t2.5\n")
    intra_s, _ = parse_contact_pairs(str(solo), genome)
    assert intra_s[1, 1] == 5.0

    # bare-numeric chromosome names must not be dtype-inferred to int
    gnum = GenomeBins(["1", "2"], [5_000_000, 3_000_000], 1_000_000)
    num = tmp_path / "num.txt"
    num.write_text("chrom1\tstart1\tchrom2\tstart2\tbalanced\n"
                   "1\t0\t1\t2000000\t1.5\n")
    intra_n, _ = parse_contact_pairs(str(num), gnum)
    assert intra_n[0, 2] == 1.5

    # negative start coords are skipped (ref: key absent from bin2node),
    # not wrapped into the wrong matrix row
    negf = tmp_path / "neg.txt"
    negf.write_text("chrom1\tstart1\tchrom2\tstart2\tbalanced\n"
                    "chr1\t-1000000\tchr1\t1000000\t2.5\n")
    intra_neg, inter_neg = parse_contact_pairs(str(negf), genome)
    assert intra_neg.sum() == 0 and inter_neg.sum() == 0


def test_outlier_detection(problem, rng):
    genome, dims, chrom_sizes, frozen = problem
    params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes)
    x = np.asarray([[1, 5, 9, 12], [2, 4, 6, 0]], dtype=np.int32)
    scores = per_position_scores(params, frozen, dims, x)
    assert scores.shape == (2, 4)
    ranks = rank_outliers(params, frozen, dims, x, k=3)
    assert ranks.shape == (2, 3)
    assert 3 not in ranks[1]          # pad position never ranked

    edges = np.asarray([[1, 5, 9], [2, 6, 11], [3, 8, 14]], np.int32)
    pairs = {(a, b) for e in edges for a in e for b in e if a != b}
    inputs, points = generate_outliers(edges, pairs, genome.num_nodes, rng,
                                       per_edge=5)
    assert len(inputs) == len(points)
    assert len(inputs) > 0
    hit = outlier_hit_rate(params, frozen, dims, inputs, points, k=3)
    assert hit.shape == (3,)
    assert (np.diff(hit) >= 0).all()         # cumulative
    assert 0.0 <= hit[0] <= hit[-1] <= 1.0


def test_node_filter_trailing_empty_cluster():
    """np.add.reduceat raises on offsets[i] == len(flat); the segment sum
    must handle empty clusters anywhere in the CSR."""
    from matcha_tpu.data.legacy import filter_low_frequency_nodes
    flat = np.array([1, 2, 1, 2, 1, 2], dtype=np.int32)
    offsets = np.array([0, 2, 2, 4, 6, 6], dtype=np.int64)  # two empties
    chrom_range = np.array([[1, 3]], dtype=np.int64)
    res = filter_low_frequency_nodes(flat, offsets, chrom_range,
                                     min_freq=2, freq_count_cap=100)
    # nodes 1,2 appear 3x each -> survive; 3 non-empty clusters kept
    assert res.offsets.tolist() == [0, 2, 4, 6]
    assert res.flat.tolist() == [1, 2, 1, 2, 1, 2]


def test_analysis_bands_matches_reference_rule(rng, tmp_path):
    """analysis_SPRITE oracle: per-anchor combinations over members > i+5,
    then min-adjacent-gap > 5 filter, then frequency-band binning
    (ref History_version/Code/analysis_SPRITE.py:26-42,88-116) — must equal
    the one-pass count + band split."""
    from collections import Counter
    from itertools import combinations
    from matcha_tpu.apps.analysis_bands import build_frequency_band_files

    size = 3
    clusters = []
    for _ in range(300):
        m = int(rng.integers(size, 12))
        nodes = sorted(set(int(rng.integers(1, 120)) for _ in range(m)))
        if len(nodes) >= size:
            clusters.append(nodes)
    flat = np.concatenate([np.asarray(c) for c in clusters]).astype(np.int32)
    offsets = np.zeros(len(clusters) + 1, dtype=np.int64)
    np.cumsum([len(c) for c in clusters], out=offsets[1:])

    # oracle (anchor rule, shrink filter size<=len<25)
    counter = Counter()
    for cl in clusters:
        if not (size <= len(cl) < 25):
            continue
        arr = np.asarray(cl)
        for i in cl:
            for comb in combinations(arr[arr > i + 5], size - 1):
                key = (i,) + comb
                if np.diff(key).min() > 5:
                    counter[key] += 1
    bands = [(2, 3), (3, 5), (5, 8), (8, 12), (12, -1)]
    oracle = {b: set() for b in bands}
    for key, f in counter.items():
        for lo, hi in bands:
            if f >= lo and (hi < 0 or f < hi):
                oracle[(lo, hi)].add(key)

    got = build_frequency_band_files(flat, offsets, size, str(tmp_path),
                                     verbose=False)
    for b in bands:
        assert {tuple(map(int, r)) for r in got[b]} == oracle[b], b
    assert (tmp_path / "2_3_3.npy").exists()
    assert (tmp_path / "upper_3.npy").exists()
