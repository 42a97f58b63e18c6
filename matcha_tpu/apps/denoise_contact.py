"""Contact-map denoising app.

Artifact parity with the reference's ``denoise_contact.py``
(ref: Code/denoise_contact.py:90-236): per chromosome, score every intra-chrom
bin pair with gap >= min_distance, sqrt-coverage-normalize the probability and
raw matrices, combine via max(proba*origin, proba), renormalize, zero gap
rows/cols, quantile-transform, write origin/denoise heatmaps and a
cooler-layout ``denoised.mcool``.

The reference's per-pair Python loops become vectorized numpy scatter /
gather; scoring runs on device via apps.predict.
"""

from __future__ import annotations

import os
from typing import Optional

import h5py
import numpy as np
from sklearn.preprocessing import QuantileTransformer

from matcha_tpu.apps.predict import predict_proba
from matcha_tpu.genome import GenomeBins


def generate_pair_wise(genome: GenomeBins, chrom_id: int,
                       min_distance: int) -> np.ndarray:
    """All intra-chrom node pairs (i, j) with j >= i + min_distance
    (ref :67-74; note j starts AT i+min_distance, so min_distance=0 includes
    the diagonal, as in the reference)."""
    s, e = genome.chrom_range[chrom_id]
    i, j = np.meshgrid(np.arange(s, e), np.arange(s, e), indexing="ij")
    keep = j >= i + min_distance
    return np.stack([i[keep], j[keep]], axis=1).astype(np.int64)


def proba2matrix(pairs: np.ndarray, proba: np.ndarray) -> np.ndarray:
    """Symmetric dense accumulation (ref proba2matrix :31-61, intra branch)."""
    lo = pairs.min()
    size = int(pairs.max() - lo + 1)
    m = np.zeros((size, size), dtype="float32")
    np.add.at(m, (pairs[:, 0] - lo, pairs[:, 1] - lo), proba)
    return m + m.T


def _sqrt_coverage_normalize(m: np.ndarray) -> np.ndarray:
    c1 = np.sqrt(m.mean(axis=-1, keepdims=True))
    c2 = np.sqrt(m.mean(axis=0, keepdims=True))
    return m / (c1 + 1e-15) / (c2 + 1e-15)


def _quantile(m: np.ndarray) -> np.ndarray:
    qt = QuantileTransformer(n_quantiles=1000, output_distribution="uniform")
    return qt.fit_transform(m.reshape(-1, 1)).reshape(m.shape)


def denoise_chromosome(params, frozen, dims, genome: GenomeBins,
                       intra_adj: np.ndarray, chrom_id: int,
                       min_distance: int, batch_size: int = 10_000,
                       use_fast: bool = True):
    """-> (pairs, denoised matrix, origin matrix, proba matrix, pixel values)

    use_fast: score all pairs with the closed-form factorization
    (apps/pairwise_fast.py — two matmuls instead of millions of forwards;
    exact for k=2)."""
    pairs = generate_pair_wise(genome, chrom_id, min_distance)
    if use_fast:
        from matcha_tpu.apps.pairwise_fast import pairwise_proba_matrix
        full = pairwise_proba_matrix(params, frozen, dims, genome, chrom_id)
        s = genome.chrom_range[chrom_id, 0]
        proba = full[pairs[:, 0] - s, pairs[:, 1] - s].astype(np.float32)
    else:
        proba = predict_proba(params, frozen, dims, pairs,
                              batch_size=batch_size)
    origin_vals = intra_adj[pairs[:, 0] - 1, pairs[:, 1] - 1]

    my_proba = _sqrt_coverage_normalize(proba2matrix(pairs, proba))
    origin_part = proba2matrix(pairs, origin_vals)
    gap1 = origin_part.sum(axis=-1) == 0
    gap2 = origin_part.sum(axis=0) == 0
    origin_part = _sqrt_coverage_normalize(origin_part)

    my = np.maximum(my_proba * origin_part, my_proba)
    my = _sqrt_coverage_normalize(my)
    my[gap1, :] = 0.0
    my[:, gap2] = 0.0
    my_proba[gap1, :] = 0.0
    my_proba[:, gap2] = 0.0

    my = _quantile(my)
    origin_part = _quantile(origin_part)
    my_proba = _quantile(my_proba)

    lo = pairs.min()
    values = my[pairs[:, 0] - lo, pairs[:, 1] - lo]
    return pairs, my, origin_part, my_proba, values


def _write_mcool_skeleton(f: h5py.File, genome: GenomeBins) -> h5py.Group:
    """cooler layout resolutions/<res>/{bins,chroms} (ref :113-138)."""
    grp = f.create_group("resolutions").create_group(str(genome.resolution))
    bins = grp.create_group("bins")
    chrom_idx, starts = [], []
    for c in range(genome.num_chroms):
        s, e = genome.chrom_range[c]
        chrom_idx += [c] * (e - s)
        starts += (np.arange(e - s, dtype=np.int64)
                   * genome.resolution).tolist()
    bins.create_dataset("chrom", data=np.asarray(chrom_idx))
    bins.create_dataset("start", data=np.asarray(starts))
    bins.create_dataset("end",
                        data=np.asarray(starts) + genome.resolution)
    chroms = grp.create_group("chroms")
    chroms.create_dataset(
        "name", data=[c.encode("utf8") for c in genome.chrom_names],
        dtype=h5py.special_dtype(vlen=str))
    return grp


def _heatmap(matrix: np.ndarray, path: str) -> None:
    """origin/denoise heatmap pngs (ref :194-228)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(5, 5))
    plt.subplots_adjust(left=0.0, right=1.0, top=1.0, bottom=0.0)
    ax = plt.gca()
    ax.imshow(matrix, cmap="Reds", vmin=0.0, vmax=1.0)
    ax.set_axis_off()
    plt.savefig(path, dpi=300)
    plt.close(fig)


def run_denoise(bundle_path: str, *, min_distance: int = 0,
                output_mcool: str = "denoised.mcool",
                plot_dir: Optional[str] = None,
                batch_size: int = 10_000, log=print) -> str:
    """Full denoise pass over every chromosome -> denoised.mcool
    (ref module body :90-236)."""
    from matcha_tpu.train.runtime import load_model_bundle
    params, dims, genome, frozen = load_model_bundle(bundle_path)
    intra_adj = np.load(os.path.join(bundle_path, "intra_adj.npy"))

    bin1, bin2, balanced = [], [], []
    with h5py.File(output_mcool, "w") as f:
        grp = _write_mcool_skeleton(f, genome)
        for c in range(genome.num_chroms):
            s_, e_ = genome.chrom_range[c]
            if int(e_ - s_) <= min_distance:
                # a chromosome shorter than the gap has no pairs at all
                # (e.g. chrM at coarse resolution) — skip, don't crash
                log(f"skipping {genome.chrom_names[c]}: fewer bins than "
                    f"min_distance={min_distance}")
                continue
            pairs, my, origin, _, values = denoise_chromosome(
                params, frozen, dims, genome, intra_adj, c, min_distance,
                batch_size)
            bin1.append(pairs[:, 0] - 1)
            bin2.append(pairs[:, 1] - 1)
            balanced.append(values)
            if plot_dir:
                os.makedirs(plot_dir, exist_ok=True)
                name = genome.chrom_names[c]
                _heatmap(my, os.path.join(plot_dir, f"{name}_denoise.png"))
                _heatmap(origin, os.path.join(plot_dir, f"{name}_origin.png"))
            log(f"denoised {genome.chrom_names[c]}: {len(pairs)} pairs")
        pix = grp.create_group("pixels")
        pix.create_dataset("bin1_id", data=np.concatenate(bin1))
        pix.create_dataset("bin2_id", data=np.concatenate(bin2))
        pix.create_dataset("balanced", data=np.concatenate(balanced))
    return output_mcool


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description="denoise contact maps")
    p.add_argument("-m", "--model", required=True,
                   help="model bundle dir (temp_dir/model2load)")
    p.add_argument("-o", "--output", default="denoised.mcool")
    p.add_argument("-d", "--min-distance", type=int, default=0)
    p.add_argument("-p", "--plot-dir", default=None)
    a = p.parse_args(argv)
    run_denoise(a.model, min_distance=a.min_distance, output_mcool=a.output,
                plot_dir=a.plot_dir)


if __name__ == "__main__":
    main()
