"""Shard-major stream layout (parallel/stream.py).

The merged token-stream loss concatenates per-k buckets along the
data-sharded batch axis; the shard-major layout makes those concats
communication-free under a mesh.  Pinned here:

  * shard_concat / shard_split are exact inverses (original row order back)
  * forward_buckets with n_shards>1 is numerically identical to n_shards=1
  * the full sharded train epoch's compiled HLO carries no large per-step
    all-gather / collective-permute traffic (the reshard bug this layout
    removes cost ~440 MB/step at bench geometry)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from matcha_tpu.genome import GenomeBins
from matcha_tpu.models.hypersagnn import (ModelDims, build_frozen_tables,
                                          init_model)
from matcha_tpu.parallel.stream import divisible, shard_concat, shard_split


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    genome = GenomeBins(["chr1", "chr2", "chr3"],
                        [30_000_000, 22_000_000, 15_000_000], 1_000_000)
    n = genome.num_nodes
    intra = rng.random((n, n)).astype(np.float32)
    intra = intra + intra.T
    inter = rng.random((n, n)).astype(np.float32)
    dims = ModelDims(dim=16, n_head=4, num_chroms=3, num_nodes=n)
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes)
    frozen = build_frozen_tables(genome, intra, inter)
    return genome, dims, params, frozen


def test_concat_split_roundtrip():
    rng = np.random.default_rng(0)
    for ns in (1, 2, 4, 8):
        parts = [rng.normal(size=(n, 3)).astype(np.float32)
                 for n in (8, 16, 24, 40)]
        out = shard_concat([jnp.asarray(p) for p in parts], ns)
        assert out.shape == (88, 3)
        back = shard_split(out, ns, [p.shape[0] for p in parts])
        for p, b in zip(parts, back):
            np.testing.assert_array_equal(p, np.asarray(b))


def test_shard_major_is_permutation_of_plain():
    rng = np.random.default_rng(1)
    parts = [jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
             for n in (8, 16)]
    plain = np.asarray(jnp.concatenate(parts))
    major = np.asarray(shard_concat(parts, 4))
    assert sorted(plain.tolist()) == sorted(major.tolist())
    # shard 0's rows: first 2 of part A then first 4 of part B
    np.testing.assert_array_equal(major[:6],
                                  np.concatenate([plain[:2], plain[8:12]]))


def test_divisible_guard():
    assert divisible([8, 16], 4)
    assert not divisible([8, 18], 4)
    assert not divisible([8, 16], 1)


@pytest.mark.parametrize("mode", ["per-k", "pad-max"])
def test_forward_buckets_n_shards_exact(problem, mode):
    """forward_buckets(n_shards=ns) == forward_buckets(n_shards=1), eval
    mode (the layout is a consistent write/read permutation)."""
    from matcha_tpu.models.hypersagnn import forward_buckets
    genome, dims, params, frozen = problem
    rng = np.random.default_rng(2)
    n_nodes = int(genome.num_nodes)
    xs = {k: jnp.asarray(rng.integers(1, n_nodes + 1, size=(16, k)),
                         jnp.int32) for k in (2, 3, 4)}
    ref = forward_buckets(params, frozen, dims, xs, attention_mode=mode,
                          n_shards=1)
    for ns in (2, 4, 8):
        got = forward_buckets(params, frozen, dims, xs, attention_mode=mode,
                              n_shards=ns)
        for k in xs:
            np.testing.assert_allclose(np.asarray(ref[k]), np.asarray(got[k]),
                                       rtol=0, atol=1e-6)


def test_sharded_epoch_has_no_stream_collectives(problem):
    """Compiled-HLO check: with the shard-major layout, the per-step
    (while-body) all-gather + collective-permute volume of the DP train
    epoch stays below 1 MB (was ~440 MB/step before the layout fix)."""
    from matcha_tpu.data.batcher import BucketedBatcher
    from matcha_tpu.parallel.mesh import make_mesh
    from matcha_tpu.sampler.bloom import build_bloom_dict
    from matcha_tpu.sampler.negative import ChromTable
    from matcha_tpu.train.runtime import Trainer, TrainSettings
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from comm_budget import collect

    genome, dims, params, frozen = problem
    mesh = make_mesh(8, 1)
    rng = np.random.default_rng(3)
    n_nodes = int(genome.num_nodes)
    buckets = {k: (rng.integers(1, n_nodes + 1, size=(256, k))
                   .astype(np.int32),
                   rng.random(256).astype(np.float32)) for k in (2, 3)}
    blooms = build_bloom_dict({k: v[0] for k, v in buckets.items()})
    tr = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                 TrainSettings(alpha=1.0, beta=0.001), blooms=blooms,
                 mesh=mesh)
    batcher = BucketedBatcher(buckets, batch_size=64, num_batch_per_iter=2)
    hlo = tr.lower_train_epoch(batcher.next_epoch()).compile().as_text()
    per_step, _ = collect(hlo)
    resharding = (per_step.get("all-gather", 0)
                  + per_step.get("collective-permute", 0)
                  + per_step.get("all-to-all", 0))
    assert resharding < 1_000_000, per_step


def test_indexed_sharded_epoch_has_no_stream_collectives(problem):
    """The indexed device-resident epoch under a data mesh keeps the same
    <1 MB/step collective budget: the on-device bulk gather (replicated base,
    data-sharded indices) is local per shard, and the gathered batches are
    constrained straight onto the "data" axis."""
    from matcha_tpu.data.batcher import BucketedBatcher
    from matcha_tpu.parallel.mesh import make_mesh
    from matcha_tpu.sampler.bloom import build_bloom_dict
    from matcha_tpu.sampler.negative import ChromTable
    from matcha_tpu.train.runtime import Trainer, TrainSettings
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from comm_budget import collect

    genome, dims, params, frozen = problem
    mesh = make_mesh(8, 1)
    rng = np.random.default_rng(4)
    n_nodes = int(genome.num_nodes)
    buckets = {k: (rng.integers(1, n_nodes + 1, size=(256, k))
                   .astype(np.int32),
                   rng.random(256).astype(np.float32)) for k in (2, 3)}
    blooms = build_bloom_dict({k: v[0] for k, v in buckets.items()})
    tr = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                 TrainSettings(alpha=1.0, beta=0.001), blooms=blooms,
                 mesh=mesh)
    batcher = BucketedBatcher(buckets, batch_size=64, num_batch_per_iter=2)
    assert tr.pin_base_buckets(batcher)
    hlo = tr.lower_epoch_indexed(batcher).compile().as_text()
    per_step, _ = collect(hlo)
    resharding = (per_step.get("all-gather", 0)
                  + per_step.get("collective-permute", 0)
                  + per_step.get("all-to-all", 0))
    assert resharding < 1_000_000, per_step
