"""Fused feature-major proposal kernel (ops/propose.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matcha_tpu.genome import GenomeBins
from matcha_tpu.ops.propose import (propose_phase1, propose_phase1_ref,
                                    supported_block)
from matcha_tpu.sampler.bloom import build_bloom
from matcha_tpu.sampler.negative import ChromTable, sample_negatives


def _inputs(rng, k, n, n_nodes=96, T=8):
    """Random feature-major phase-1 inputs with realistic structure."""
    orig = np.sort(rng.integers(1, n_nodes, size=(n, k)), axis=1)
    change = (rng.random((n, k)) < 0.5)
    change[np.arange(n), rng.integers(0, k, n)] = True   # >= 1 corrupted
    lo = np.ones((n, k), np.float32)
    hi = np.full((n, k), float(n_nodes), np.float32)
    u = rng.random((T, k, n), dtype=np.float32)
    return (jnp.asarray(orig.T.astype(np.int32)),
            jnp.asarray(change.T.astype(np.int32)),
            jnp.asarray(lo.T), jnp.asarray(hi.T), jnp.asarray(u))


@pytest.mark.parametrize("k", [2, 3, 5])
@pytest.mark.parametrize("n", [128, 512])
def test_kernel_matches_mirror(rng, k, n):
    """Interpret-mode kernel ≡ the pure-jnp mirror, bit-exact."""
    args = _inputs(rng, k, n)
    for md, S in [(0, 2), (1, 4)]:
        probe_k, has_k = propose_phase1(*args, min_distance=md,
                                        max_probes=S, interpret=True)
        probe_r, has_r = propose_phase1_ref(*args, min_distance=md,
                                            max_probes=S)
        np.testing.assert_array_equal(np.asarray(probe_k),
                                      np.asarray(probe_r))
        np.testing.assert_array_equal(np.asarray(has_k), np.asarray(has_r))


def test_mirror_semantics(rng):
    """The mirror implements the phase-1 contract: stage s holds the s-th
    structurally-valid candidate in trial order, sorted, gap-respecting."""
    k, n, T, S, md = 3, 128, 8, 3, 1
    args = _inputs(rng, k, n, T=T)
    orig_t, change_t, lo_t, hi_t, u = (np.asarray(a) for a in args)
    probe, has = propose_phase1_ref(*args, min_distance=md, max_probes=S)
    probe, has = np.asarray(probe), np.asarray(has)

    # row-wise oracle: recompute candidates per trial in plain python
    for row in rng.integers(0, n, size=25):
        valids = []
        for t in range(T):
            cand = []
            for c in range(k):
                w = hi_t[c, row] - lo_t[c, row]
                v = lo_t[c, row] + min(np.floor(w * u[t, c, row]), w - 1.0)
                cand.append(int(v) if change_t[c, row] else
                            int(orig_t[c, row]))
            cand = sorted(cand)
            if all(cand[i + 1] - cand[i] > md for i in range(k - 1)):
                valids.append(cand)
        for s in range(S):
            if s < len(valids):
                assert has[s, row]
                assert probe[:, :, row][s].tolist() == valids[s]
            else:
                assert not has[s, row]
                assert probe[s, :, row].tolist() == [0] * k


def test_supported_block():
    assert supported_block(12288) == 2048
    assert supported_block(512) == 512
    assert supported_block(128 * 3) == 128
    assert supported_block(100) == 0


def test_contains_cols_matches_contains(rng):
    """Feature-major membership query ≡ row-major on the same data."""
    rows = np.sort(rng.integers(1, 500, size=(300, 4)), axis=1).astype(
        np.int32)
    bloom = build_bloom(rows[:150])
    queries = jnp.asarray(rows)
    a = np.asarray(bloom.contains(queries))
    b = np.asarray(bloom.contains_cols(queries.T))
    np.testing.assert_array_equal(a, b)
    # and with a leading stage axis, as the sampler calls it
    q3 = jnp.stack([queries.T, queries.T[:, ::-1]])      # (2, k, N)
    c = np.asarray(bloom.contains_cols(q3))
    np.testing.assert_array_equal(c[0], a)


@pytest.fixture
def table():
    genome = GenomeBins(["chr1", "chr2"], [60_000_000, 40_000_000],
                        1_000_000)
    return genome, ChromTable.from_genome(genome)


def test_sampler_pallas_impl_constraints(table, rng):
    """sample_negatives(propose_impl='pallas') end-to-end (interpret mode on
    CPU): negatives sorted, distinct, chromosome-preserved, not accepted
    rows of the Bloom filter."""
    genome, ct = table
    n_nodes = genome.num_nodes
    for md in (0, 2):
        # positives must respect the gap themselves (as real k-mers do —
        # the generator enforces it); otherwise a row whose uncorrupted
        # members violate it can never yield a valid candidate
        pos = np.sort(rng.integers(1, n_nodes // 2, size=(200, 3)), axis=1)
        pos = pos[np.all(np.diff(pos, axis=1) > md, axis=1)][:32]
        assert len(pos) == 32
        bloom = build_bloom(pos)
        neg = np.asarray(sample_negatives(
            jax.random.PRNGKey(7), jnp.asarray(pos, jnp.int32), ct, md,
            bloom, neg_num=4, propose_impl="pallas"))   # n = 128 rows
        assert neg.shape == (128, 3)
        assert (np.diff(neg, axis=1) > md).all()
        orig = np.tile(pos, (4, 1))
        np.testing.assert_array_equal(genome.node2chrom[neg],
                                      genome.node2chrom[orig])


def test_propose_impl_validated(table, rng):
    """Unknown impl values raise (a typo silently measuring XLA would
    invalidate a pallas A/B); unsupported sizes warn and fall back."""
    genome, ct = table
    pos = jnp.asarray([[1, 5, 9], [2, 7, 12]], jnp.int32)
    bloom = build_bloom(np.asarray(pos))
    with pytest.raises(ValueError, match="propose_impl"):
        sample_negatives(jax.random.PRNGKey(0), pos, ct, 0, bloom,
                         propose_impl="Pallas")
    with pytest.warns(UserWarning, match="fell back"):
        sample_negatives(jax.random.PRNGKey(0), pos, ct, 0, bloom,
                         neg_num=3, propose_impl="pallas")   # n=6 rows


def test_trainer_with_pallas_propose(table, rng):
    """One Trainer epoch with propose_impl='pallas' (interpret mode inside
    the jitted scan): finite losses, same machinery as the default."""
    from matcha_tpu.data.batcher import BucketedBatcher
    from matcha_tpu.models.hypersagnn import (ModelDims, build_frozen_tables,
                                              init_model)
    from matcha_tpu.train.runtime import Trainer, TrainSettings
    genome, ct = table
    n = genome.num_nodes
    intra = rng.random((n, n)).astype(np.float32)
    inter = rng.random((n, n)).astype(np.float32)
    dims = ModelDims(dim=16, n_head=4, num_chroms=2, num_nodes=n)
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes)
    frozen = build_frozen_tables(genome, intra + intra.T, inter)
    edges = []
    while len(edges) < 64:
        r = np.sort(rng.integers(1, n, 2))
        if r[0] != r[1]:
            edges.append(r)
    buckets = {2: (np.asarray(edges, np.int32),
                   rng.random(64).astype(np.float32) + 0.5)}
    # batch 32 x neg_num 3 = 96 rows -> unsupported block, falls back to
    # xla inside jit; batch 128/neg 1 has no pos... use neg_num=4 -> 128
    settings = TrainSettings(alpha=1.0, beta=0.001, neg_num=4,
                             propose_impl="pallas")
    trainer = Trainer(params, frozen, dims, ct, settings,
                      blooms={2: build_bloom(buckets[2][0])})
    batcher = BucketedBatcher(buckets, batch_size=32, num_batch_per_iter=2)
    r = trainer.train_epoch(batcher)
    assert np.isfinite(r["bce"]) and np.isfinite(r["recon"])


def test_sampler_pallas_matches_xla_distribution(table, rng):
    """Corruption-rate and acceptance statistics of the two impls agree
    (they share the change-mask draw; only the proposal stream differs)."""
    genome, ct = table
    pos = np.sort(rng.integers(1, genome.num_nodes, size=(2000, 2)), axis=1)
    pos = pos[np.diff(pos, axis=1)[:, 0] > 0][:1024]
    bloom = build_bloom(pos)
    outs = {}
    for impl in ("xla", "pallas"):
        neg = np.asarray(sample_negatives(
            jax.random.PRNGKey(3), jnp.asarray(pos, jnp.int32), ct, 0,
            bloom, neg_num=2, propose_impl=impl))       # n = 2048
        orig = np.tile(pos, (2, 1))
        outs[impl] = (neg != orig).mean()
    # both corrupt ~the truncated-binomial expected fraction; equal to
    # within sampling noise of 2048 rows
    assert abs(outs["xla"] - outs["pallas"]) < 0.04, outs
