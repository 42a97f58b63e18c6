"""CLI smoke tests: the module entry points drive the full pipeline."""

import subprocess
import sys

import numpy as np
import pytest

from matcha_tpu.config import Config
from matcha_tpu.genome import GenomeBins

from synth import make_synthetic_dataset, write_chrom_sizes


@pytest.mark.slow
def test_cli_pipeline(tmp_path):
    rng = np.random.default_rng(3)
    genome = GenomeBins(["chr1"], [30_000_000], 1_000_000)
    cluster_path, mcool_path = make_synthetic_dataset(tmp_path, genome, rng,
                                                      n_clusters=500)
    config = Config(
        cluster_path=cluster_path, mcool_path=mcool_path,
        resolution=1_000_000, chrom_list=genome.chrom_names,
        chrom_size=write_chrom_sizes(tmp_path, genome),
        temp_dir=str(tmp_path / "Temp"), kmer_size=[2], embed_dim=16,
        n_head=4, batch_size=16, num_batch_per_iter=4,
        stage1_epochs=1, stage2_epochs=1, use_pallas_attention="off")
    cfg_path = tmp_path / "config.JSON"
    config.save(str(cfg_path))

    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
           "HOME": "/root"}

    def run(*args):
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms','cpu');"
             "from matcha_tpu.pipeline import main; main()"]
            + list(args),
            capture_output=True, text=True, cwd="/root/repo", env=env,
            timeout=500)
        assert r.returncode == 0, r.stderr[-2000:]
        return r

    run("process", "-c", str(cfg_path))
    assert (tmp_path / "Temp" / "edge_list.npy").exists()
    run("kmers", "-c", str(cfg_path))
    assert (tmp_path / "Temp" / "all_2_counter.npy").exists()
    run("train", "-c", str(cfg_path))
    assert (tmp_path / "Temp" / "model2load" / "params.pkl").exists()
    assert (tmp_path / "embeddings.npy").exists()
    assert (tmp_path / "Temp" / "logs" / "metrics.jsonl").exists()
    run("pretrain", "-c", str(cfg_path))
    assert (tmp_path / "Temp" / "walk_embeddings.npy").exists()

    # inference apps over the trained bundle
    inp = tmp_path / "query.txt"
    inp.write_text("chr1:500000\tchr1:3500000\nchr1:0\tchr1:9000000\n")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from matcha_tpu.apps.predict_multiway import main; main()",
         "-m", str(tmp_path / "Temp" / "model2load"),
         "-i", str(inp), "-o", str(tmp_path / "out.txt")],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    proba = np.loadtxt(tmp_path / "out.txt")
    assert proba.shape == (2,)
