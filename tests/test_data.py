"""Cluster parsing, mcool ingest, and k-mer generation parity tests."""

import itertools
from collections import Counter

import numpy as np
import pytest

from matcha_tpu.data.clusters import (clusters_to_list, load_edge_list,
                                      parse_clusters, save_edge_list)
from matcha_tpu.data.kmers import (_count_kmers_numpy, count_kmers,
                                   generate_kmers)
from matcha_tpu.data.mcool import contacts_from_arrays


# ------------------------------------------------------------------ clusters
def make_cluster_file(tmp_path, genome, rng, n_lines=200):
    """Synthesize a .clusters file + the expected parsed result."""
    res = genome.resolution
    lines, expected = [], []
    for i in range(n_lines):
        m = rng.integers(1, 12)
        members, raw = set(), []
        for _ in range(m):
            c = int(rng.integers(0, genome.num_chroms + 1))  # sometimes bad chrom
            if c == genome.num_chroms:
                raw.append(f"chrUn:{int(rng.integers(0, 10 ** 6))}")
                continue
            coord = int(rng.integers(0, genome.chrom_sizes[c]))
            raw.append(f"{genome.chrom_names[c]}:{coord}")
            members.add(int(genome.chrom_range[c, 0] + coord // res))
        lines.append(f"cluster{i}\t" + "\t".join(raw))
        if len(raw) >= 2 and 2 <= len(members) <= 6:
            expected.append(sorted(members))
    path = tmp_path / "test.clusters"
    path.write_text("\n".join(lines) + "\n")
    return str(path), expected


def test_parse_clusters(tmp_path, tiny_genome, rng):
    path, expected = make_cluster_file(tmp_path, tiny_genome, rng)
    flat, offsets = parse_clusters(path, tiny_genome, max_cluster_size=6)
    got = clusters_to_list(flat, offsets)
    assert got == expected
    # invariant: sorted distinct node ids, all >= 1
    assert (flat >= 1).all()
    for e in got:
        assert e == sorted(set(e))


def test_edge_list_roundtrip(tmp_path, tiny_genome, rng):
    path, _ = make_cluster_file(tmp_path, tiny_genome, rng, n_lines=50)
    flat, offsets = parse_clusters(path, tiny_genome, max_cluster_size=6)
    save_edge_list(str(tmp_path), flat, offsets)
    f2, o2 = load_edge_list(str(tmp_path))
    assert (f2 == flat).all() and (o2 == offsets).all()
    # reference-layout ragged artifact loads as list of lists
    ragged = np.load(tmp_path / "edge_list.npy", allow_pickle=True)
    assert list(ragged[0]) == clusters_to_list(flat, offsets)[0]


def test_raw_size_prefilter(tmp_path, tiny_genome):
    # > max_cluster_size * 50 raw members -> dropped (ref Code/process.py:54)
    many = "\t".join(f"chr1:{i * 1000}" for i in range(2 * 50 + 1))
    ok = "chr1:0\tchr2:0"
    p = tmp_path / "c.clusters"
    p.write_text(f"a\t{many}\nb\t{ok}\n")
    flat, offsets = parse_clusters(str(p), tiny_genome, max_cluster_size=2)
    assert len(offsets) - 1 == 1


# --------------------------------------------------------------------- mcool
def test_contacts_from_arrays(tiny_genome, rng):
    n_pix = 500
    b1 = rng.integers(1, tiny_genome.node_num, n_pix)
    b2 = rng.integers(1, tiny_genome.node_num, n_pix)
    w = rng.random(n_pix)
    w[::17] = np.nan  # NaN rows skipped (ref Code/process.py:162)
    intra, inter = contacts_from_arrays(tiny_genome, b1, b2, w)

    n = tiny_genome.node_num - 1
    ref_intra = np.zeros((n, n))
    ref_inter = np.zeros((n, n))
    for i in range(n_pix):
        if np.isnan(w[i]):
            continue
        a, b = b1[i] - 1, b2[i] - 1
        if tiny_genome.node2chrom[b1[i]] == tiny_genome.node2chrom[b2[i]]:
            ref_intra[a, b] += w[i]
            ref_intra[b, a] += w[i]
        else:
            ref_inter[a, b] += w[i]
            ref_inter[b, a] += w[i]
    np.testing.assert_allclose(intra, ref_intra, rtol=1e-6)
    np.testing.assert_allclose(inter, ref_inter, rtol=1e-6)


# --------------------------------------------------------------------- kmers
def reference_kmer_counts(clusters, k, max_size, min_dis):
    """Oracle: the reference's per-anchor combinations rule
    (ref Code/generate_kmers.py:12-37)."""
    counter = Counter()
    for cl in clusters:
        if not (k <= len(cl) <= max_size):
            continue
        arr = np.asarray(cl)
        for i in cl:  # anchor = each member; combos from members > i + min_dis
            rest = arr[arr > i + min_dis]
            for comb in itertools.combinations(rest, k - 1):
                if k > 2:
                    gaps = np.diff(comb)
                    if gaps.min() <= min_dis:
                        continue
                counter[(i,) + comb] += 1
    return counter


@pytest.mark.parametrize("k,min_dis", [(2, 0), (3, 0), (2, 2), (4, 1), (5, 0)])
def test_kmer_counts_match_reference(tiny_genome, rng, k, min_dis):
    clusters = []
    for _ in range(120):
        m = int(rng.integers(k, 10))
        nodes = sorted(set(
            int(rng.integers(1, tiny_genome.node_num)) for _ in range(m)))
        if len(nodes) >= 2:
            clusters.append(nodes)
    flat = np.concatenate([np.asarray(c) for c in clusters]).astype(np.int32)
    offsets = np.zeros(len(clusters) + 1, dtype=np.int64)
    np.cumsum([len(c) for c in clusters], out=offsets[1:])

    oracle = reference_kmer_counts(clusters, k, max_size=10, min_dis=min_dis)
    kmers, freqs = _count_kmers_numpy(flat, offsets, k, 10, min_dis,
                                      chunk_kmers=1000)
    got = {tuple(r): int(f) for r, f in zip(kmers, freqs)}
    assert got == {tuple(map(int, key)): v for key, v in oracle.items()}


def test_native_kernel_matches_numpy(tiny_genome, rng):
    from matcha_tpu.native import kmer_native
    if not kmer_native.available():
        pytest.skip("native kernel unavailable")
    clusters = []
    for _ in range(300):
        m = int(rng.integers(2, 15))
        nodes = sorted(set(
            int(rng.integers(1, tiny_genome.node_num)) for _ in range(m)))
        if len(nodes) >= 2:
            clusters.append(nodes)
    flat = np.concatenate([np.asarray(c) for c in clusters]).astype(np.int32)
    offsets = np.zeros(len(clusters) + 1, dtype=np.int64)
    np.cumsum([len(c) for c in clusters], out=offsets[1:])
    for k, min_dis in [(2, 0), (3, 1), (4, 0)]:
        nk, nf = kmer_native.count_kmers(flat, offsets, k, 15, min_dis)
        pk, pf = _count_kmers_numpy(flat, offsets, k, 15, min_dis, 10 ** 6)
        assert (nk == pk).all() and (nf == pf).all()


def test_generate_kmers_freq_cutoff(tmp_path):
    # two clusters sharing the pair (1, 5): freq 2 survives cutoff=2
    clusters = [[1, 5, 9], [1, 5], [2, 7]]
    flat = np.concatenate(clusters).astype(np.int32)
    offsets = np.array([0, 3, 5, 7], dtype=np.int64)
    out = generate_kmers(flat, offsets, [2], max_cluster_size=5,
                         min_distance=0, min_freq_cutoff=2,
                         temp_dir=str(tmp_path), verbose=False)
    kmers, freqs = out[2]
    assert kmers.tolist() == [[1, 5]]
    assert freqs.tolist() == [2]
    assert (tmp_path / "all_2_counter.npy").exists()


def test_sharded_kmers_match_single_shot(tiny_genome, rng, tmp_path):
    """Multi-host k-mer sharding (DESIGN §8.4): per-shard partial counts
    merged with the cutoff applied post-merge must equal the single-shot
    artifacts exactly — including k-mers that clear the cutoff only in
    total (below it in every individual shard)."""
    from matcha_tpu.data.kmers import (generate_kmers_shard,
                                       merge_kmer_shards, shard_clusters)
    clusters = []
    for _ in range(200):
        m = int(rng.integers(2, 9))
        nodes = sorted(set(
            int(rng.integers(1, tiny_genome.node_num)) for _ in range(m)))
        if len(nodes) >= 2:
            clusters.append(nodes)
    flat = np.concatenate([np.asarray(c) for c in clusters]).astype(np.int32)
    offsets = np.zeros(len(clusters) + 1, dtype=np.int64)
    np.cumsum([len(c) for c in clusters], out=offsets[1:])

    # shards partition the cluster set exactly
    n_shards = 3
    tot = sum(shard_clusters(flat, offsets, i, n_shards)[0].size
              for i in range(n_shards))
    assert tot == flat.size

    single = tmp_path / "single"
    sharded = tmp_path / "sharded"
    ref = generate_kmers(flat, offsets, [2, 3], max_cluster_size=10,
                         min_distance=0, min_freq_cutoff=2,
                         temp_dir=str(single), verbose=False)
    for i in range(n_shards):
        generate_kmers_shard(flat, offsets, [2, 3], max_cluster_size=10,
                             min_distance=0, shard_index=i,
                             shard_count=n_shards, temp_dir=str(sharded),
                             verbose=False)
    got = merge_kmer_shards([2, 3], shard_count=n_shards,
                            temp_dir=str(sharded), min_freq_cutoff=2,
                            verbose=False)
    for k in (2, 3):
        assert (got[k][0] == ref[k][0]).all()
        assert (got[k][1] == ref[k][1]).all()
        a = np.load(sharded / f"all_{k}_counter.npy")
        b = np.load(single / f"all_{k}_counter.npy")
        assert (a == b).all()
        fa = np.load(sharded / f"all_{k}_freq_counter.npy")
        fb = np.load(single / f"all_{k}_freq_counter.npy")
        assert (fa == fb).all()

    # process-parallel bucket merge: bit-equal to the serial streaming merge
    got_w = merge_kmer_shards([2, 3], shard_count=n_shards,
                              temp_dir=str(sharded), min_freq_cutoff=2,
                              verbose=False, workers=2)
    for k in (2, 3):
        assert (got_w[k][0] == ref[k][0]).all()
        assert (got_w[k][1] == ref[k][1]).all()

    # pre-metadata shards (sidecar .meta.npz absent): the merge
    # reconstructs the cuts by a bounded chunked scan, still bit-equal
    import glob
    import os
    for mp in glob.glob(str(sharded / "*.meta.npz")):
        os.remove(mp)
    got_n = merge_kmer_shards([2, 3], shard_count=n_shards,
                              temp_dir=str(sharded), min_freq_cutoff=2,
                              verbose=False)
    for k in (2, 3):
        assert (got_n[k][0] == ref[k][0]).all()
        assert (got_n[k][1] == ref[k][1]).all()


def test_shard_clusters_empty_shard():
    from matcha_tpu.data.kmers import merge_kmer_shards, shard_clusters
    flat = np.array([1, 5, 2, 7], dtype=np.int32)
    offsets = np.array([0, 2, 4], dtype=np.int64)
    sf, so = shard_clusters(flat, offsets, 2, 3)   # only 2 clusters
    assert sf.size == 0 and so.tolist() == [0]


def test_native_cluster_parser_matches_python(tiny_genome, rng, tmp_path):
    """The mmap C++ .clusters parser must reproduce the Python oracle
    exactly — including raw-cap counting of EMPTY fields, unknown-chrom
    drops, bin flooring, dedup+sort, and distinct-size bounds."""
    from matcha_tpu.native import cluster_native
    if not cluster_native.available():
        pytest.skip("native cluster parser unavailable")
    g = tiny_genome
    res = g.resolution
    lines = []
    for i in range(4000):
        m = int(rng.integers(0, 30))
        parts = [f"c{i}"]
        for _ in range(m):
            ci = int(rng.integers(0, len(g.chrom_names) + 1))
            if ci == len(g.chrom_names):
                parts.append(f"chrUn:{int(rng.integers(0, 10 ** 7))}")
            else:
                size = g.chrom_sizes[ci]
                parts.append(
                    f"{g.chrom_names[ci]}:{int(rng.integers(0, size))}")
        lines.append("\t".join(parts))
    # edge cases: huge raw line (over cap), trailing tab (empty field),
    # all-duplicate members, line without trailing newline at EOF
    big = "\t".join(["huge"] + [f"chr1:{j * res}" for j in range(30 * 50)])
    lines.append(big)
    lines.append("trail\tchr1:0\tchr2:5000000\t")
    lines.append("dups\tchr1:100\tchr1:200\tchr1:300")  # same bin -> 1 node
    path = tmp_path / "synth.clusters"
    path.write_text("\n".join(lines))   # no trailing newline

    from matcha_tpu.data.clusters import _parse_lines
    with open(path) as f:
        pf, po = _parse_lines(f, g, max_cluster_size=25)
    nf, no = cluster_native.parse_clusters(str(path), g, 25)
    assert (po == no).all()
    assert (pf == nf).all()
    # threads=1 and threads=8 agree (order preservation across chunks)
    nf1, no1 = cluster_native.parse_clusters(str(path), g, 25, n_threads=8)
    assert (no == no1).all() and (nf == nf1).all()


def test_native_cluster_parser_rejects_malformed_coord(tiny_genome, tmp_path):
    """Malformed coordinates on a KNOWN chromosome must raise loudly (the
    Python oracle's int() ValueError) — not silently land in a wrong bin."""
    from matcha_tpu.native import cluster_native
    if not cluster_native.available():
        pytest.skip("native cluster parser unavailable")
    good = tmp_path / "good.clusters"
    # int()-tolerant forms: surrounding spaces, plus sign
    good.write_text("a\tchr1: 5000000 \tchr2:+3000000\n")
    gf, go = cluster_native.parse_clusters(str(good), tiny_genome, 25)
    from matcha_tpu.data.clusters import _parse_lines
    with open(good) as f:
        pf, po = _parse_lines(f, tiny_genome, 25)
    assert (gf == pf).all() and (go == po).all()

    bad = tmp_path / "bad.clusters"
    bad.write_text("a\tchr1:1,234\tchr2:5\n")
    with pytest.raises(ValueError):
        cluster_native.parse_clusters(str(bad), tiny_genome, 25)
    # unknown chrom with garbage coord is still skipped, like the oracle
    ok = tmp_path / "ok.clusters"
    ok.write_text("a\tchrUn:garbage\tchr1:0\tchr2:1000000\n")
    nf, no = cluster_native.parse_clusters(str(ok), tiny_genome, 25)
    with open(ok) as f:
        pf, po = _parse_lines(f, tiny_genome, 25)
    assert (nf == pf).all() and (no == po).all()


def test_bucketed_packed_merge_equals_plain(monkeypatch):
    """The bucketed two-pass packed merge (large-input path) is bit-equal to
    the single-sort packed merge and to the lexsort reference."""
    from matcha_tpu.data import kmers as km

    rng = np.random.default_rng(7)
    parts = []
    for _ in range(4):
        rows = np.sort(rng.integers(1, 500, (3000, 5)), axis=1).astype(
            np.int32)
        rows, cnt = km._count_rows(rows)
        parts.append((rows, cnt.astype(np.int64)))
    plain_rows, plain_cnt = km._merge_many(parts)

    monkeypatch.setattr(km, "_BUCKET_MERGE_MIN", 0)
    buck_rows, buck_cnt = km._merge_many(parts)
    assert np.array_equal(plain_rows, buck_rows)
    assert np.array_equal(plain_cnt, buck_cnt)

    # lexsort oracle: merge by concatenating raw rows
    raw = np.concatenate([np.repeat(p[0], p[1], axis=0) for p in parts])
    orows, ocnt = km._count_rows(raw)
    assert np.array_equal(plain_rows, orows)
    assert np.array_equal(plain_cnt, ocnt)
