"""Per-op device-time profile of the training step on the real chip.

Runs the bench workload (the same Trainer.fit / bench.py epoch_indexed_fn
program) under jax.profiler.trace, converts the xspace with xprof's
hlo_stats tool, and prints (a) the top ops by device time and (b) a
category rollup (attention fwd/bwd kernels, layout copies/transposes,
gathers/scatters, RNG, elementwise fusions, ...) normalized per step.

This is the measurement tool behind BASELINE.md's step-profile tables
(VERDICT r3 #2/#3/#7: name the copy/reshape term, the attention-backward
term, and what scales with node count at 100 kb).

Usage:
  python scripts/step_profile.py [--batch 2048] [--steps 100] [--chroms 23]
                                 [--resolution 1000000] [--csv out.csv]
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def parse_hlo_stats(trace_dir):
    """xspace -> list of dicts with program/category/name/time.

    Only the NEWEST profile session under trace_dir is parsed: feeding
    xplane files from several sessions into one conversion makes
    xspace_to_tool_data return None."""
    from xprof.convert import raw_to_tool_data as rttd
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    by_dir = {}
    for p in paths:
        by_dir.setdefault(os.path.dirname(p), []).append(p)
    newest = max(by_dir, key=os.path.getmtime)
    data, _ = rttd.xspace_to_tool_data(by_dir[newest], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data)
    # gviz table: {"cols": [...], "rows": [{"c": [{"v": ...}, ...]}]}
    cols = [c["label"] for c in rows["cols"]]
    out = []
    for r in rows["rows"]:
        out.append(dict(zip(cols, [c.get("v") if c else None
                                   for c in r["c"]])))
    return out


CATEGORIES = [
    ("attention bwd (pallas)", lambda n, c: "bwd_kernel" in n),
    ("attention fwd (pallas)", lambda n, c: "fwd_kernel" in n),
    ("table scatter (pallas)", lambda n, c: "scatter_kernel" in n
        or "onehot" in n),
    ("bincount (pallas)", lambda n, c: "bincount" in n),
    ("other custom-call", lambda n, c: c == "custom-call"),
    ("layout copy/transpose", lambda n, c:
        ("copy" in c or "transpose" in c.lower()) or n.startswith("copy")
        or ("transpose" in n and "fusion" not in c)),
    ("gather", lambda n, c: "gather" in c or n.startswith("gather")),
    ("scatter", lambda n, c: "scatter" in c or n.startswith("scatter")),
    ("rng", lambda n, c: "rng" in n or "threefry" in n or "rbg" in n),
    ("convolution/dot", lambda n, c: c in ("convolution", "dot")),
    ("reduce", lambda n, c: "reduce" in c),
    ("sort", lambda n, c: "sort" in c or n.startswith("sort")),
]


def categorize(name, cat):
    for label, pred in CATEGORIES:
        try:
            if pred(name or "", cat or ""):
                return label
        except TypeError:
            pass
    return f"other:{cat}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--chroms", type=int, default=23)
    ap.add_argument("--resolution", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--csv", default=None)
    ap.add_argument("--trace-dir", default="/tmp/matcha_step_profile")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--hlo-map", action="store_true",
                    help="also dump the optimized HLO of the epoch program "
                         "and print the source metadata of the top ops "
                         "(attributes anonymized fusion.NNNN names)")
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from matcha_tpu.config import Config
    from matcha_tpu.pipeline import resolve_perf
    cfg = Config()
    perf = resolve_perf(cfg)

    from __graft_entry__ import _build_problem, _random_buckets
    from matcha_tpu.data.batcher import BucketedBatcher
    from matcha_tpu.sampler.bloom import build_bloom_dict
    from matcha_tpu.sampler.negative import ChromTable
    from matcha_tpu.train.runtime import Trainer, TrainSettings
    import jax.numpy as jnp

    if args.resolution != 1_000_000:
        # 100 kb configuration: bf16 tables (the shipped default there)
        os.environ.setdefault("MATCHA_TABLE_DTYPE", "bfloat16")
    genome, dims, params, frozen = _build_problem(
        dim=args.dim, n_head=8, chroms=args.chroms,
        table_dtype=jnp.bfloat16 if args.resolution != 1_000_000 else None)
    if args.resolution != 1_000_000:
        from matcha_tpu.genome import GenomeBins
        from matcha_tpu.models.hypersagnn import (ModelDims,
                                                  build_frozen_tables,
                                                  init_model)
        hg38 = [248_956_422, 242_193_529, 198_295_559, 190_214_555,
                181_538_259, 170_805_979, 159_345_973, 145_138_636,
                138_394_717, 133_797_422, 135_086_622, 133_275_309,
                114_364_328, 107_043_718, 101_991_189, 90_338_345,
                83_257_441, 80_373_285, 58_617_616, 64_444_167,
                46_709_983, 50_818_468, 156_040_895]
        names = [f"chr{i+1}" for i in range(22)] + ["chrX"]
        genome = GenomeBins(names[:args.chroms], hg38[:args.chroms],
                            args.resolution)
        n = genome.num_nodes
        rng0 = np.random.default_rng(0)
        # random features at 100 kb scale would be a (30k)^2 corrcoef on
        # host: build small random frozen tables directly instead
        intra = np.eye(n, dtype=np.float32)
        inter = rng0.random((n, n)).astype(np.float32)
        dims = ModelDims(dim=args.dim, n_head=8, num_chroms=args.chroms,
                         num_nodes=n)
        chrom_sizes = [int(e - s) for s, e in genome.chrom_range]
        params = init_model(jax.random.PRNGKey(0), dims, chrom_sizes)
        frozen = build_frozen_tables(genome, intra, inter,
                                     table_dtype=jnp.bfloat16)
    dims = dims._replace(compute_dtype=perf["compute_dtype"],
                         use_pallas_attention=perf["use_pallas_attention"])
    rng = np.random.default_rng(0)
    buckets = _random_buckets(genome, rng,
                              n_edges=max(4 * args.batch, 20_000))
    blooms = build_bloom_dict({k: v[0] for k, v in buckets.items()})
    settings = TrainSettings(alpha=1.0, beta=0.001, neg_num=3,
                             token_stream=perf["token_stream"],
                             propose_impl=perf["propose_impl"])
    trainer = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                      settings, blooms=blooms)
    batcher = BucketedBatcher(buckets, batch_size=args.batch,
                              num_batch_per_iter=args.steps)
    assert trainer.pin_base_buckets(batcher)

    t0 = time.time()
    jax.block_until_ready(trainer.train_epoch_indexed_launch(batcher)["bce"])
    print(f"warmup (compile + backend init): {time.time() - t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    jax.block_until_ready(trainer.train_epoch_indexed_launch(batcher)["bce"])
    step_ms = (time.time() - t0) / args.steps * 1000
    print(f"steady epoch: {time.time() - t0:.2f}s = {step_ms:.2f} ms/step",
          file=sys.stderr)

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        jax.block_until_ready(
            trainer.train_epoch_indexed_launch(batcher)["bce"])

    rows = parse_hlo_stats(args.trace_dir)
    # column names vary slightly across xprof versions; resolve by substring
    def col(row, *cands):
        for key in row:
            kl = key.lower()
            if any(c in kl for c in cands):
                return row[key]
        return None

    agg = {}
    named = []
    total = 0.0
    for r in rows:
        name = str(col(r, "hlo op name", "op name") or "")
        cat = str(col(r, "hlo op category", "category") or "")
        t = col(r, "total time (us)", "time (us)", "self time")
        if t is None:
            continue
        t = float(t)
        total += t
        named.append((t, name, cat))
        label = categorize(name, cat)
        agg[label] = agg.get(label, 0.0) + t

    per_step = 1.0 / args.steps / 1000.0   # us -> ms, per step
    print(f"\n== category rollup (ms/step; measured step {step_ms:.2f} ms; "
          f"device total {total * per_step:.2f} ms) ==")
    for label, t in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {label:32s} {t * per_step:8.3f}  "
              f"({100 * t / total:5.1f}%)")

    hlo_meta = {}
    if args.hlo_map:
        txt = trainer.lower_epoch_indexed(batcher).compile().as_text()
        import re
        # "%fusion.2996 = ... metadata={op_name="..." source_file=... }"
        for m in re.finditer(
                r"%?([\w.-]+) = [^\n]*metadata=\{([^}]*)\}", txt):
            nm, meta = m.group(1), m.group(2)
            om = re.search(r'op_name="([^"]*)"', meta)
            sf = re.search(r'source_file="([^"]*)"', meta)
            sl = re.search(r"source_line=(\d+)", meta)
            hlo_meta[nm] = (
                (om.group(1) if om else "")[:90]
                + (f"  [{os.path.basename(sf.group(1))}"
                   f":{sl.group(1) if sl else '?'}]" if sf else ""))

    print(f"\n== top {args.top} ops ==")
    named.sort(reverse=True)
    for t, name, cat in named[:args.top]:
        print(f"  {t * per_step:8.3f} ms  [{cat}] {name[:110]}")
        if name in hlo_meta:
            print(f"              -> {hlo_meta[name]}")

    if args.csv:
        import csv
        with open(args.csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["ms_per_step", "category", "name"])
            for t, name, cat in named:
                w.writerow([t * per_step, cat, name])
        print(f"wrote {args.csv}")


if __name__ == "__main__":
    main()
