"""Measure the PyTorch reference's training throughput on this host.

Imports the reference's model classes from /root/reference/Code (oracle
measurement only — nothing is copied into the framework) and drives them with
the reference's training-step semantics (ref Code/main.py:37-58,361-459):
per 96-sample batch, CPU rejection-sample 3 negatives per positive with
chromosome-constrained corruption + membership-set rejection, pad, forward,
weighted BCE + recon, backward, AdamW step.

The recorded number feeds bench.py's vs_baseline.  The reference supports
CUDA or CPU only; on this host it runs on CPU.
"""

import math
import os
import random
import sys
import time

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from reference_harness import build_torch_reference  # noqa: E402
from matcha_tpu.genome import GenomeBins  # noqa: E402

BATCH = 96
NEG_NUM = 3
K_LIST = (2, 3, 4, 5)
STEPS = 30


def reference_generate_negative(x, member_sets, genome, min_dis=0,
                                neg_num=NEG_NUM):
    """Reference semantics of generate_negative (ref Code/main.py:361-459)."""
    k = x.shape[1]
    neg_list = []
    change_pool = np.random.binomial(k, 0.5, len(x) * neg_num * 2)
    change_pool = list(change_pool[change_pool != 0])
    for sample in x:
        for _ in range(neg_num):
            change_num = change_pool.pop()
            changes = np.random.choice(np.arange(k), change_num,
                                       replace=False)
            temp = np.copy(sample)
            while tuple(temp) in member_sets[len(temp)]:
                temp = np.copy(sample)
                for change in changes:
                    c = genome.node2chrom[temp[change]]
                    start, end = genome.chrom_range[c]
                    temp[change] = int(
                        math.floor((end - start) * random.random())) + start
                temp = list(set(temp))
                if len(temp) < len(sample):
                    temp = np.copy(sample)
                    continue
                temp.sort()
                dis = np.diff(np.asarray(temp))
                if dis.min() <= min_dis:
                    temp = np.copy(sample)
            neg_list.append(np.asarray(temp))
    return np.stack(neg_list)


def main():
    torch.set_num_threads(os.cpu_count())
    sizes = [248_956_422, 242_193_529, 198_295_559, 190_214_555,
             181_538_259, 170_805_979, 159_345_973, 145_138_636,
             138_394_717, 133_797_422, 135_086_622, 133_275_309,
             114_364_328, 107_043_718, 101_991_189, 90_338_345,
             83_257_441, 80_373_285, 58_617_616, 64_444_167,
             46_709_983, 50_818_468, 156_040_895]
    genome = GenomeBins([f"chr{i+1}" for i in range(22)] + ["chrX"],
                        sizes, 1_000_000)
    n = genome.num_nodes
    rng = np.random.default_rng(0)
    intra = rng.random((n, n)).astype(np.float32)
    intra = intra + intra.T
    inter = rng.random((n, n)).astype(np.float32)

    model = build_torch_reference(genome, intra, inter, dim=64, n_head=8)
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, amsgrad=False)

    # positive pools + membership sets per k
    pools, member_sets = {}, {}
    for k in K_LIST:
        e = np.sort(rng.choice(np.arange(1, n + 1), (8000, k)), axis=1)
        e = e[(np.diff(e, axis=1) > 0).all(axis=1)]
        pools[k] = e.astype(np.int64)
        member_sets[k] = set(map(tuple, e.tolist()))
    member_sets = [set()] * 2 + [member_sets.get(k, set())
                                 for k in range(2, max(K_LIST) + 1)]
    member_sets = {i: member_sets[i] if i < len(member_sets) else set()
                   for i in range(max(K_LIST) + 1)}

    loss_fn = F.binary_cross_entropy_with_logits
    t0 = None
    scored = 0
    for step in range(STEPS):
        if step == 5:                     # warmup boundary
            t0 = time.time()
            scored = 0
        k = K_LIST[step % len(K_LIST)]
        pool = pools[k]
        idx = rng.integers(0, len(pool), BATCH)
        pos = pool[idx]
        neg = reference_generate_negative(pos, member_sets, genome)
        x = torch.from_numpy(np.concatenate([pos, neg]))
        y = torch.cat([torch.ones(len(pos), 1), torch.zeros(len(neg), 1)])
        w = torch.ones(len(x), 1)
        pred, recon = model(x, return_recon=True)
        loss = loss_fn(pred, y, weight=w) * 1.0 + recon * 0.001
        opt.zero_grad()
        loss.backward()
        opt.step()
        scored += len(x)
    elapsed = time.time() - t0
    rate = scored / elapsed
    print(f"reference torch CPU: {rate:,.1f} hyperedges scored/s "
          f"({scored} in {elapsed:.2f}s, {os.cpu_count()} threads)")


if __name__ == "__main__":
    main()
