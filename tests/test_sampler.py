"""Bloom filter and negative sampler tests (statistical parity per SURVEY §7.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tpu.sampler.bloom import build_bloom, build_bloom_dict
from matcha_tpu.sampler.negative import (ChromTable, assemble_batch,
                                         sample_negatives)


# ----------------------------------------------------------------- bloom
def test_bloom_no_false_negatives(rng):
    rows = rng.integers(1, 10_000, size=(5000, 3)).astype(np.int32)
    rows = np.sort(rows, axis=1)
    f = build_bloom(rows)
    hits = np.asarray(f.contains(jnp.asarray(rows)))
    assert hits.all(), "Bloom filters must never report false negatives"


def test_bloom_false_positive_rate(rng):
    rows = np.sort(rng.integers(1, 10_000, (5000, 3)), axis=1).astype(np.int32)
    f = build_bloom(rows)
    member = set(map(tuple, rows.tolist()))
    probes = np.sort(rng.integers(1, 10_000, (20_000, 3)), axis=1).astype(np.int32)
    fresh = np.array([tuple(r) not in member for r in probes.tolist()])
    hits = np.asarray(f.contains(jnp.asarray(probes)))
    fpr = hits[fresh].mean()
    # capacity rule 5n+1000 at err 1e-3 -> generous margin
    assert fpr < 1e-2, f"false positive rate too high: {fpr}"


def test_bloom_empty():
    f = build_bloom(np.zeros((0, 2), dtype=np.int32))
    probes = jnp.asarray([[1, 2], [3, 4]], dtype=jnp.int32)
    assert not np.asarray(f.contains(probes)).any()


def test_bloom_device_host_hash_agree(rng):
    """The jnp and numpy hash paths must agree bit-for-bit."""
    from matcha_tpu.sampler.bloom import _hash_rows
    rows = rng.integers(1, 2 ** 31 - 1, size=(100, 4)).astype(np.int32)
    with np.errstate(over="ignore"):
        h1n, h2n = _hash_rows(rows, np)
    h1j, h2j = _hash_rows(jnp.asarray(rows), jnp)
    assert (np.asarray(h1j) == h1n).all()
    assert (np.asarray(h2j) == h2n).all()


# ------------------------------------------------------------- negatives
@pytest.fixture(scope="module")
def table():
    from matcha_tpu.genome import GenomeBins
    g = GenomeBins(["chr1", "chr2", "chr3"],
                   [49_500_000, 30_200_000, 19_999_999], 1_000_000)
    return g, ChromTable.from_genome(g)


def _random_positives(g, rng, b, k, min_dis=0):
    """Positives obeying the generation invariants (sorted, gaps > min_dis)."""
    out = []
    while len(out) < b:
        nodes = np.sort(rng.integers(1, g.node_num, size=k))
        if (np.diff(nodes) > min_dis).all():
            out.append(nodes)
    return np.asarray(out, dtype=np.int32)


def test_stage1_negatives_are_copies(table, rng):
    g, tab = table
    pos = _random_positives(g, rng, 8, 3)
    neg = sample_negatives(jax.random.PRNGKey(0), jnp.asarray(pos), tab,
                           0, None, neg_num=3)
    neg = np.asarray(neg)
    assert neg.shape == (24, 3)
    np.testing.assert_array_equal(neg, np.tile(pos, (3, 1)))


@pytest.mark.parametrize("k,min_dis", [(2, 0), (3, 2), (5, 1)])
def test_negative_constraints(table, rng, k, min_dis):
    g, tab = table
    pos = _random_positives(g, rng, 64, k, min_dis)
    bloom = build_bloom(pos)
    neg = np.asarray(sample_negatives(
        jax.random.PRNGKey(1), jnp.asarray(pos), tab, min_dis, bloom,
        neg_num=3))
    assert neg.shape == (64 * 3, k)
    # sorted + distinct + min pairwise gap (ref Code/main.py:410-421)
    gaps = np.diff(neg, axis=1)
    assert (gaps > min_dis).all()
    # all members valid node ids
    assert (neg >= 1).all() and (neg < g.node_num).all()
    # negatives not in the positive set (modulo Bloom false positives ~0)
    pos_set = set(map(tuple, pos.tolist()))
    dup = sum(tuple(r) in pos_set for r in neg.tolist())
    assert dup == 0


def test_negative_chromosome_preserved(table, rng):
    """Each corrupted position must stay within its original chromosome
    (ref Code/main.py:403-407) — so the per-row multiset of chromosomes is
    preserved."""
    g, tab = table
    pos = _random_positives(g, rng, 128, 3)
    bloom = build_bloom(pos)
    neg = np.asarray(sample_negatives(
        jax.random.PRNGKey(2), jnp.asarray(pos), tab, 0, bloom, neg_num=1))
    pos_chroms = np.sort(g.node2chrom[pos], axis=1)
    neg_chroms = np.sort(g.node2chrom[neg], axis=1)
    np.testing.assert_array_equal(pos_chroms, neg_chroms)


def test_negatives_actually_corrupt(table, rng):
    g, tab = table
    pos = _random_positives(g, rng, 256, 3)
    bloom = build_bloom(pos)
    neg = np.asarray(sample_negatives(
        jax.random.PRNGKey(3), jnp.asarray(pos), tab, 0, bloom, neg_num=1))
    # every row must differ from its source (it's not in the bloom set)
    assert (neg != pos).any(axis=1).all()
    # number of changed positions follows truncated Binomial(3, .5):
    # mean = (3*.5)/(1-1/8) = 1.714; loose bounds
    changed = (neg != pos).sum(axis=1).mean()
    assert 1.2 < changed < 2.3


def test_change_mask_distribution():
    from matcha_tpu.sampler.negative import _sample_change_mask
    k = 4
    m = np.asarray(_sample_change_mask(jax.random.PRNGKey(0), 20_000, k))
    counts = m.sum(axis=1)
    assert counts.min() >= 1
    # truncated Binomial(4, 1/2): P(1)=4/15, P(2)=6/15, P(3)=4/15, P(4)=1/15
    freq = np.bincount(counts, minlength=k + 1)[1:] / len(counts)
    np.testing.assert_allclose(freq, [4 / 15, 6 / 15, 4 / 15, 1 / 15],
                               atol=0.02)
    # positions uniform: each column hit equally often
    col = m.mean(axis=0)
    np.testing.assert_allclose(col, col.mean(), atol=0.02)


def test_fallback_telemetry_dense_bloom(rng):
    """At realistic 1 Mb unlabeled densities, chromosome-constrained k=2
    corruption hits the Bloom filter ~50% of the time.  The bounded-parallel
    sampler alone leaves a measurable Bloom-hit fallback residue (mislabeled
    likely-positives); the re-trial loop must drive it to ~zero, and the
    counters must see both."""
    from matcha_tpu.genome import GenomeBins
    from matcha_tpu.sampler.negative import sample_negatives_with_stats
    g = GenomeBins(["chr1"], [248_000_000], 1_000_000)   # 1 Mb chr1: 249 nodes
    tab = ChromTable.from_genome(g)
    n = g.num_nodes
    # unlabeled set = 50% of all intra-chrom pairs (dense Bloom)
    ii, jj = np.triu_indices(n, k=1)
    pairs = np.stack([ii + 1, jj + 1], axis=1).astype(np.int32)
    sel = rng.random(len(pairs)) < 0.5
    unlabeled = pairs[sel]
    bloom = build_bloom(unlabeled)
    pos = jnp.asarray(unlabeled[rng.permutation(len(unlabeled))[:2048]])

    # old behavior (T=3, no re-trial): percent-level mislabeled negatives —
    # the counter must measure it
    _, st_old = jax.jit(lambda k: sample_negatives_with_stats(
        k, pos, tab, 0, bloom, neg_num=3, max_trials=3, extra_rounds=0))(
            jax.random.PRNGKey(0))
    rate_old = float(st_old["bloom_fallback"]) / float(st_old["rows"])
    assert rate_old > 1e-3, f"dense fixture should stress T=3: {rate_old}"

    # current defaults (T=8 + bounded re-trial): clean
    neg, st = jax.jit(lambda k: sample_negatives_with_stats(
        k, pos, tab, 0, bloom, neg_num=3))(jax.random.PRNGKey(0))
    rate = float(st["bloom_fallback"]) / float(st["rows"])
    assert rate <= 1e-4, f"fallback rate too high with re-trial: {rate}"
    assert float(st["orig_fallback"]) == 0
    # and the negatives really are clean: none in the unlabeled set
    member = set(map(tuple, unlabeled.tolist()))
    dup = sum(tuple(r) in member for r in np.asarray(neg).tolist())
    assert dup <= int(st["bloom_fallback"])


def test_assemble_batch(table, rng):
    g, _ = table
    pos = jnp.asarray(_random_positives(g, rng, 4, 2))
    w = jnp.asarray([2.0, 3.0, 4.0, 5.0])
    neg = jnp.concatenate([pos, pos, pos], axis=0)
    x, y, ww = assemble_batch(pos, w, neg)
    assert x.shape == (16, 2) and y.shape == (16, 1) and ww.shape == (16, 1)
    assert np.asarray(y).reshape(-1).tolist() == [1] * 4 + [0] * 12
    assert np.asarray(ww).reshape(-1).tolist() == [2, 3, 4, 5] + [1] * 12


def test_build_bloom_dict(rng):
    unl = {2: np.sort(rng.integers(1, 1000, (500, 2)), 1).astype(np.int32),
           3: np.sort(rng.integers(1, 1000, (300, 3)), 1).astype(np.int32)}
    filters = build_bloom_dict(unl)
    assert set(filters) == {2, 3}
    assert np.asarray(filters[2].contains(jnp.asarray(unl[2]))).all()
    assert np.asarray(filters[3].contains(jnp.asarray(unl[3]))).all()


def test_chrom_bounds_fast_path_matches_gather(table, rng):
    """The compare-select range path (host-constant chrom_bounds, the path
    the Trainer enables inside jit where the ChromTable argument is traced)
    must produce the exact same negatives as the node2chrom gather path."""
    import jax
    g, tbl = table
    pos = _random_positives(g, rng, 64, 3)
    bloom = build_bloom_dict({3: pos})[3]
    bounds = tuple((int(s), int(e)) for s, e in
                   zip(np.asarray(tbl.chrom_start), np.asarray(tbl.chrom_end)))
    key = jax.random.PRNGKey(7)

    # traced table WITHOUT bounds -> gather path
    neg_gather = jax.jit(
        lambda kk, pp, tt: sample_negatives(kk, pp, tt, 0, bloom))(
        key, pos, tbl)
    # traced table WITH host bounds -> compare-select path
    neg_fast = jax.jit(
        lambda kk, pp, tt: sample_negatives(kk, pp, tt, 0, bloom,
                                            chrom_bounds=bounds))(
        key, pos, tbl)
    # eager concrete table (extracts bounds itself)
    neg_eager = sample_negatives(key, pos, tbl, 0, bloom)

    assert (np.asarray(neg_gather) == np.asarray(neg_fast)).all()
    assert (np.asarray(neg_gather) == np.asarray(neg_eager)).all()


def test_range_draw_never_reaches_hi():
    """Range-draw invariant: lo + min(floor(span*u), span-1) < hi for every
    f32 u < 1.  (A sweep shows f32 rounding never actually pushes
    floor(span*u) to span for u < 1, so the clamp in the sampler is
    defensive insurance — this pins the invariant either way.)"""
    u_max = np.nextafter(np.float32(1.0), np.float32(0.0))
    for span in np.asarray([2, 3, 5, 4096, 4097, 30011, 1 << 20],
                           np.float32):
        raw = np.floor(span * u_max)
        clamped = np.minimum(raw, span - np.float32(1.0))
        assert clamped < span


def test_negatives_stay_in_table(table):
    """Negatives never index past the node table (statistical smoke over
    many draws with the clamped range arithmetic)."""
    import jax
    g, tbl = table
    rng = np.random.default_rng(5)
    pos = _random_positives(g, rng, 256, 2)
    bloom = build_bloom_dict({2: pos})[2]
    for seed in range(4):
        neg = np.asarray(sample_negatives(
            jax.random.PRNGKey(seed), jnp.asarray(pos), tbl, 0, bloom,
            neg_num=3))
        assert neg.max() < g.node_num
        assert neg.min() >= 1
