"""Inference app tests: denoise_contact, predict_multiway, plot_embedding."""

import h5py
import numpy as np
import pytest

import jax

from matcha_tpu.apps.denoise_contact import (generate_pair_wise, proba2matrix,
                                             run_denoise)
from matcha_tpu.apps.predict import predict_logits, predict_proba
from matcha_tpu.apps.predict_multiway import (parse_interaction_file,
                                              run_predict_multiway)
from matcha_tpu.apps.plot_embedding import plot_embeddings
from matcha_tpu.genome import GenomeBins
from matcha_tpu.models.hypersagnn import (ModelDims, build_frozen_tables,
                                          forward, init_model)
from matcha_tpu.train.runtime import save_model_bundle


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bundle")
    rng = np.random.default_rng(5)
    genome = GenomeBins(["chr1", "chr2"], [14_000_000, 9_000_000], 1_000_000)
    n = genome.num_nodes
    intra = rng.random((n, n)).astype(np.float32)
    intra = intra + intra.T
    inter = rng.random((n, n)).astype(np.float32)
    dims = ModelDims(dim=16, n_head=4, num_chroms=2, num_nodes=n)
    chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
    params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes)
    path = str(tmp / "model2load")
    save_model_bundle(path, params, dims, genome, intra, inter)
    frozen = build_frozen_tables(genome, intra, inter)
    return path, params, dims, genome, frozen, intra


def test_generate_pair_wise_matches_reference(bundle):
    _, _, _, genome, _, _ = bundle
    chrom_range = genome.chrom_range
    for cid, min_dis in [(0, 0), (1, 2)]:
        # reference loop (ref Code/denoise_contact.py:67-74)
        ref = []
        for i in range(chrom_range[cid, 0], chrom_range[cid, 1]):
            for j in range(i + min_dis, chrom_range[cid, 1]):
                ref.append([i, j])
        got = generate_pair_wise(genome, cid, min_dis)
        np.testing.assert_array_equal(got, np.asarray(ref))


def test_proba2matrix_matches_reference(rng):
    pairs = np.stack([rng.integers(5, 20, 100),
                      rng.integers(5, 20, 100)], axis=1)
    proba = rng.random(100).astype("float32")
    # reference accumulation (ref :36-49)
    lo = pairs.min()
    size = pairs.max() - lo + 1
    m_ref = np.zeros((size, size), dtype="float32")
    for (a, b), p in zip(pairs, proba):
        m_ref[a - lo, b - lo] += p
    m_ref = m_ref + m_ref.T
    np.testing.assert_allclose(proba2matrix(pairs, proba), m_ref, rtol=1e-5)


def test_predict_bucketing_consistent(bundle):
    """Mixed-size ragged input scores must equal per-sample forward calls."""
    path, params, dims, genome, frozen, _ = bundle
    rng = np.random.default_rng(1)
    n = genome.num_nodes
    samples = []
    for _ in range(37):
        k = int(rng.integers(2, 6))
        samples.append(sorted(rng.choice(np.arange(1, n + 1), k,
                                         replace=False).tolist()))
    got = predict_logits(params, frozen, dims, samples, batch_size=16)
    import jax.numpy as jnp
    for i in [0, 5, 17, 36]:
        one = np.asarray(forward(params, frozen, dims,
                                 jnp.asarray([samples[i]]))).item()
        assert abs(got[i] - one) < 1e-4


def test_run_denoise(bundle, tmp_path):
    path, _, _, genome, _, intra = bundle
    out = str(tmp_path / "denoised.mcool")
    run_denoise(path, min_distance=0, output_mcool=out,
                plot_dir=str(tmp_path / "plots"), batch_size=500,
                log=lambda *a: None)
    with h5py.File(out) as f:
        grp = f["resolutions"][str(genome.resolution)]
        assert list(grp["chroms"]["name"].asstr()) == genome.chrom_names
        b1 = np.asarray(grp["pixels"]["bin1_id"])
        bal = np.asarray(grp["pixels"]["balanced"])
        n_pairs = sum(
            (e - s) * (e - s + 1) // 2 for s, e in genome.chrom_range)
        assert len(b1) == len(bal) == n_pairs
        assert np.isfinite(bal).all()
        assert (bal >= 0).all() and (bal <= 1).all()
        nbins = len(np.asarray(grp["bins"]["chrom"]))
        assert nbins == genome.num_nodes
    assert (tmp_path / "plots" / "chr1_denoise.png").exists()
    assert (tmp_path / "plots" / "chr2_origin.png").exists()


def test_predict_multiway(bundle, tmp_path):
    path, _, _, genome, _, _ = bundle
    inp = tmp_path / "input.txt"
    inp.write_text(
        "chr1:500000\tchr1:3500000\n"                      # pair
        "chr1:100000\tchr2:200000\tchr2:5000000\n"         # triple
        "chrUn:5\tchr1:0\n"                                 # singleton after filter
        "chr1:0\tchr1:999999\tchr1:2000001\n")              # dedup (same bin x2)
    samples = parse_interaction_file(str(inp), genome)
    assert len(samples) == 3   # singleton line dropped
    assert samples[2] == [genome.node_for("chr1", 0),
                          genome.node_for("chr1", 2000001)]
    out = tmp_path / "output.txt"
    proba = run_predict_multiway(path, str(inp), str(out))
    assert proba.shape == (3,)
    assert ((proba > 0) & (proba < 1)).all()
    assert np.allclose(np.loadtxt(out), proba, atol=1e-6)


def test_plot_embedding(tmp_path, rng):
    emb = rng.standard_normal((50, 16)).astype(np.float32)
    labels = rng.integers(-1, 5, 50).astype(float)
    np.save(tmp_path / "emb.npy", emb)
    np.save(tmp_path / "lab.npy", labels)
    out = plot_embeddings(str(tmp_path / "emb.npy"),
                          str(tmp_path / "lab.npy"),
                          str(tmp_path / "scatter.png"))
    assert (tmp_path / "scatter.png").exists()


def test_denoise_normalization_chain_matches_reference_formulas(rng):
    """The sqrt-coverage/combine/gap/quantile chain vs a direct transcription
    of the reference's per-line operations (ref Code/denoise_contact.py:160-192)."""
    from sklearn.preprocessing import QuantileTransformer
    from matcha_tpu.apps.denoise_contact import _sqrt_coverage_normalize

    n = 30
    my_proba = rng.random((n, n)).astype("float32")
    origin = (rng.random((n, n)) * (rng.random((n, n)) > 0.2)).astype("float32")
    origin[5, :] = 0.0   # a gap row
    origin[:, 5] = 0.0

    # ---- reference formulas, transcribed
    def ref_norm(m):
        c1 = np.sqrt(m.mean(axis=-1, keepdims=True))
        c2 = np.sqrt(m.mean(axis=0, keepdims=True))
        return m / (c1 + 1e-15) / (c2 + 1e-15)

    mp = ref_norm(my_proba.copy())
    op = origin.copy()
    gap1 = op.sum(axis=-1) == 0
    gap2 = op.sum(axis=0) == 0
    op = ref_norm(op)
    my = np.maximum(mp * op, mp)
    my = ref_norm(my)
    my[gap1, :] = 0.0
    my[:, gap2] = 0.0
    qt = QuantileTransformer(n_quantiles=1000, output_distribution="uniform")
    my_ref = qt.fit_transform(my.reshape(-1, 1)).reshape(n, n)

    # ---- ours
    ours_mp = _sqrt_coverage_normalize(my_proba.copy())
    ours_op = origin.copy()
    g1 = ours_op.sum(axis=-1) == 0
    g2 = ours_op.sum(axis=0) == 0
    ours_op = _sqrt_coverage_normalize(ours_op)
    ours = np.maximum(ours_mp * ours_op, ours_mp)
    ours = _sqrt_coverage_normalize(ours)
    ours[g1, :] = 0.0
    ours[:, g2] = 0.0
    from matcha_tpu.apps.denoise_contact import _quantile
    ours = _quantile(ours)

    np.testing.assert_allclose(ours, my_ref, rtol=1e-5, atol=1e-6)
