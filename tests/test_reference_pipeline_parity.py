"""Artifact-level parity with the ACTUAL reference preprocessing scripts.

Runs the reference's ``process.py`` and ``generate_kmers.py`` (subprocess,
their own code from /root/reference) on our synthetic ``.clusters``/``.mcool``
fixture and compares every artifact with ours: node dictionaries, edge list,
contact matrices, and the per-k k-mer count tables.  This is the strongest
possible L1/L2 parity check without the (non-downloadable) 4DN dataset.
"""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from matcha_tpu.config import Config
from matcha_tpu.genome import GenomeBins
from matcha_tpu.pipeline import run_generate_kmers, run_process

from synth import make_synthetic_dataset, write_chrom_sizes

REF = "/root/reference/Code"


@pytest.mark.slow
@pytest.mark.parametrize("min_distance,k_list,min_freq", [
    (0, [2, 3], 2),
    # min-gap branch of the reference's rule (Code/generate_kmers.py:18,24-33)
    # plus the larger k sizes; min_freq=1 keeps the rare 4/5-mers so the
    # comparison covers every enumerated k-mer, not just repeated ones
    (2, [2, 3, 4, 5], 1),
])
def test_artifacts_match_reference_scripts(tmp_path, min_distance, k_list,
                                           min_freq):
    rng = np.random.default_rng(9)
    # >= 100 nodes: the reference's generate_kmers crashes on genomes with
    # fewer nodes than its process-pool batch size of 50
    genome = GenomeBins(["chr1", "chr2"], [61_000_000, 44_500_000], 1_000_000)
    cluster_path, mcool_path = make_synthetic_dataset(tmp_path, genome, rng,
                                                      n_clusters=1500)
    sizes_path = write_chrom_sizes(tmp_path, genome)

    # ---- our pipeline
    ours = tmp_path / "ours"
    config = Config(cluster_path=cluster_path, mcool_path=mcool_path,
                    resolution=1_000_000, chrom_list=genome.chrom_names,
                    chrom_size=sizes_path, temp_dir=str(ours),
                    max_cluster_size=25, min_distance=min_distance,
                    kmer_size=k_list, min_freq_cutoff=min_freq)
    run_process(config)
    run_generate_kmers(config)

    # ---- reference scripts in their own working dir
    work = tmp_path / "refwork"
    work.mkdir()
    theirs = tmp_path / "theirs"
    ref_config = {
        "cluster_path": cluster_path, "mcool_path": mcool_path,
        "resolution": 1_000_000, "chrom_list": genome.chrom_names,
        "chrom_size": sizes_path, "temp_dir": str(theirs),
        "max_cluster_size": 25, "min_distance": min_distance,
        "k-mer_size": k_list,
        "min_freq_cutoff": min_freq, "quantile_cutoff_for_positive": 0.6,
        "quantile_cutoff_for_unlabel": 0.4, "embed_dim": 16,
    }
    (work / "config.JSON").write_text(json.dumps(ref_config))
    for script in ["process.py", "generate_kmers.py", "utils.py"]:
        shutil.copy(os.path.join(REF, script), work / script)
    # utils.py imports pybloom_live (absent) and torch (slow); stub the
    # bloom dependency with a tiny local module
    (work / "pybloom_live.py").write_text(
        "class BloomFilter:\n"
        "    def __init__(self, *a, **k):\n        self._s = set()\n"
        "    def add(self, x):\n        self._s.add(x)\n"
        "    def __contains__(self, x):\n        return x in self._s\n"
        "    def __len__(self):\n        return len(self._s)\n")
    # numpy-2 compat shim: the reference saves ragged lists, which modern
    # numpy rejects without dtype=object
    (work / "run_ref.py").write_text(
        "import numpy as np\n"
        "_arr, _save = np.array, np.save\n"
        "def _array(*a, **k):\n"
        "    try:\n        return _arr(*a, **k)\n"
        "    except ValueError:\n"
        "        k['dtype'] = object\n        return _arr(*a, **k)\n"
        "def _savef(f, a, **k):\n"
        "    try:\n        return _save(f, a, **k)\n"
        "    except ValueError:\n"
        "        return _save(f, _arr(a, dtype=object), **k)\n"
        "np.array, np.save = _array, _savef\n"
        "import sys, runpy\n"
        "runpy.run_path(sys.argv[1], run_name='__main__')\n")
    env = dict(os.environ)
    env["MPLBACKEND"] = "Agg"
    for script in ["process.py", "generate_kmers.py"]:
        r = subprocess.run([sys.executable, "run_ref.py", script], cwd=work,
                           env=env, capture_output=True, text=True,
                           timeout=500)
        assert r.returncode == 0, f"{script}: {r.stderr[-3000:]}"

    # ---- compare artifacts
    np.testing.assert_array_equal(
        np.load(ours / "chrom_range.npy"),
        np.load(theirs / "chrom_range.npy"))
    assert (np.load(ours / "bin2node.npy", allow_pickle=True).item()
            == np.load(theirs / "bin2node.npy", allow_pickle=True).item())
    assert (np.load(ours / "node2chrom.npy", allow_pickle=True).item()
            == np.load(theirs / "node2chrom.npy", allow_pickle=True).item())

    ours_edges = [list(e) for e in
                  np.load(ours / "edge_list.npy", allow_pickle=True)]
    ref_edges = [list(e) for e in
                 np.load(theirs / "edge_list.npy", allow_pickle=True)]
    assert ours_edges == ref_edges

    np.testing.assert_allclose(np.load(ours / "intra_adj.npy"),
                               np.load(theirs / "intra_adj.npy"), rtol=1e-6)
    np.testing.assert_allclose(np.load(ours / "inter_adj.npy"),
                               np.load(theirs / "inter_adj.npy"), rtol=1e-6)

    for k in k_list:
        ok = np.load(ours / f"all_{k}_counter.npy")
        of = np.load(ours / f"all_{k}_freq_counter.npy")
        rk = np.load(theirs / f"all_{k}_counter.npy")
        rf = np.load(theirs / f"all_{k}_freq_counter.npy")
        # orderings differ; compare as sets of (kmer, freq)
        ours_set = {tuple(map(int, row)): float(f) for row, f in zip(ok, of)}
        ref_set = {tuple(map(int, row)): float(f)
                   for row, f in zip(rk.reshape(-1, k), rf)}
        assert len(ours_set) > 0, f"k={k}: empty k-mer set (fixture too thin)"
        assert ours_set == ref_set, (
            f"k={k}: {len(ours_set)} vs {len(ref_set)} kmers")
