"""End-to-end pipeline test: synthetic .clusters/.mcool -> ingest -> k-mers ->
two-stage training -> AUROC above chance -> embeddings + model bundle
(the SURVEY §7 minimum end-to-end slice)."""

import numpy as np
import pytest

from matcha_tpu.config import Config
from matcha_tpu.genome import GenomeBins
from matcha_tpu.pipeline import run_generate_kmers, run_process, run_train

from synth import make_synthetic_dataset, write_chrom_sizes


@pytest.mark.slow
def test_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    genome = GenomeBins(["chr1", "chr2"], [59_000_000, 40_000_000], 1_000_000)
    cluster_path, mcool_path = make_synthetic_dataset(tmp_path, genome, rng)
    config = Config(
        cluster_path=cluster_path, mcool_path=mcool_path,
        resolution=1_000_000, chrom_list=genome.chrom_names,
        chrom_size=write_chrom_sizes(tmp_path, genome),
        temp_dir=str(tmp_path / "Temp"), max_cluster_size=25,
        min_distance=0, kmer_size=[2, 3], min_freq_cutoff=2,
        quantile_cutoff_for_positive=0.6, quantile_cutoff_for_unlabel=0.4,
        embed_dim=16, n_head=4, batch_size=32, num_batch_per_iter=20,
        seed=1)

    g2 = run_process(config)
    assert g2.chrom_range.tolist() == genome.chrom_range.tolist()

    kmers = run_generate_kmers(config)
    assert set(kmers) == {2, 3}
    assert all(len(v[0]) > 50 for v in kmers.values())

    logs = []
    trainer, history, store = run_train(
        config, log=logs.append, stage1_epochs=1, stage2_epochs=3)

    final = history[-1]["valid"]["metrics"]
    # planted community structure must be learnable well above chance
    assert final["all"]["auroc"] > 0.75, f"AUROC too low: {final}"

    import os
    assert os.path.exists(tmp_path / "embeddings.npy")
    emb = np.load(tmp_path / "embeddings.npy")
    assert emb.shape == (genome.num_nodes, 16)
    assert os.path.exists(tmp_path / "Temp" / "model2load" / "params.pkl")
    assert os.path.exists(tmp_path / "Temp" / "model.chkpt")

    # model bundle reloads and scores
    from matcha_tpu.train.runtime import load_model_bundle
    from matcha_tpu.models.hypersagnn import forward
    import jax.numpy as jnp
    params, dims, g3, frozen = load_model_bundle(
        str(tmp_path / "Temp" / "model2load"))
    x = jnp.asarray(store.test[2][0][:8])
    logits = forward(params, frozen, dims, x)
    assert logits.shape == (8, 1)
    assert np.isfinite(np.asarray(logits)).all()
