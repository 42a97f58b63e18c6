"""Multi-way interaction predictor app.

I/O parity with the reference's ``predict_multiway.py``
(ref: Code/predict_multiway.py:15-114): input is a text file with one
candidate interaction per line, tab-separated ``chrom:coord`` members (no
leading cluster id); members on excluded chromosomes are dropped, coordinates
floored to bins, tuples deduplicated+sorted, singletons skipped; output is
``np.savetxt`` of sigmoid probabilities.
"""

from __future__ import annotations

import numpy as np

from matcha_tpu.apps.predict import predict_proba
from matcha_tpu.genome import GenomeBins


def parse_interaction_file(path: str, genome: GenomeBins) -> list:
    """-> list of sorted node-id tuples (ref parse_file :23-60)."""
    out = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split("\t")
            nodes = set()
            for info in parts:
                if not info:
                    continue
                chrom, _, coord = info.partition(":")
                if not genome.has_chrom(chrom):
                    continue
                nodes.add(genome.node_for(chrom, int(coord)))
            if len(nodes) > 1:
                out.append(sorted(nodes))
    return out


def run_predict_multiway(bundle_path: str, input_path: str,
                         output_path: str = "./output.txt",
                         batch_size: int = 10_000) -> np.ndarray:
    from matcha_tpu.train.runtime import load_model_bundle
    params, dims, genome, frozen = load_model_bundle(bundle_path)
    samples = parse_interaction_file(input_path, genome)
    proba = predict_proba(params, frozen, dims, samples, batch_size)
    np.savetxt(output_path, proba)
    return proba


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description="predict multi-way interactions")
    p.add_argument("-i", "--file", type=str, required=True)
    p.add_argument("-o", "--output", type=str, default="./output.txt")
    p.add_argument("-m", "--model", type=str, required=True,
                   help="model bundle dir (temp_dir/model2load)")
    a = p.parse_args(argv)
    run_predict_multiway(a.model, a.file, a.output)


if __name__ == "__main__":
    main()
