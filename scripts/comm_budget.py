"""Measured communication budget of the sharded training step.

With one real chip in this environment, ≥90%-scaling claims cannot be
wall-clock-measured; what CAN be measured exactly is the per-step collective
traffic of the COMPILED multi-chip program (the XLA-optimized HLO is the
same program a real slice executes).  This script:

  1. jits the full training step over a (data x model) mesh of N virtual
     devices at the bench workload geometry,
  2. parses the optimized HLO for collectives (all-reduce / all-gather /
     reduce-scatter / all-to-all / collective-permute) inside vs outside the
     scanned epoch body,
  3. combines the per-step byte volume with the measured single-chip step
     time and ICI bandwidth to bound achievable data-parallel scaling:

        eff(N) >= t_comp / (t_comp + bytes_per_chip / BW_ici)

     (no-overlap worst case; XLA overlaps the gradient all-reduce with
     backward compute, so the realized efficiency sits above this bound).

Usage: python scripts/comm_budget.py [--devices 8] [--model 2]
                                     [--batch 4096] [--step-ms 38.4]
Prints a JSON report; numbers recorded in BASELINE.md.
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s64": 8, "u64": 8, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
                "collective-permute")


def shape_bytes(shape_str: str) -> int:
    """'f32[2,64,512]' -> bytes; tuples '(f32[..], u32[..])' -> sum."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collect(hlo: str):
    """Sum collective output bytes, split into while-body (per-step) vs
    outside (one-time).  HLO text nests computations; the scanned epoch body
    is the computation reached from a while op — identified by name."""
    # map computation name -> list of (op, bytes)
    comps = {}
    cur = None
    body_names = set()
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ENTRY\s+)?%?([\w.\-]+)\s*\(.*\)\s*->", line)
        if m and ("{" in line or line.rstrip().endswith("{")):
            cur = m.group(1)
            comps[cur] = []
            continue
        if cur is None:
            continue
        if re.search(r"=\s*\(?.*while\(", line):
            bm = re.search(r"body=%?([\w.\-]+)", line)
            if bm:
                body_names.add(bm.group(1))
        opm = re.match(r"\s*%?[\w.\-]+\s*=\s*(.+?)\s+(" +
                       "|".join(_COLLECTIVES) + r")\(", line)
        if opm:
            comps[cur].append((opm.group(2), shape_bytes(opm.group(1))))

    def closure(names):
        # include computations called from the body (fusions/conditionals)
        out = set(names)
        changed = True
        while changed:
            changed = False
            for cname in comps:
                if cname in out:
                    continue
                # crude: computation names derive from callers' op names;
                # fall back to counting any non-entry computation whose name
                # embeds a body name
                if any(b in cname for b in out):
                    out.add(cname)
                    changed = True
        return out

    body_comps = closure(body_names)
    per_step, one_time = {}, {}
    for cname, ops in comps.items():
        tgt = per_step if cname in body_comps else one_time
        for op, nbytes in ops:
            tgt[op] = tgt.get(op, 0) + nbytes
    return per_step, one_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--model", type=int, default=2)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--chroms", type=int, default=23)
    ap.add_argument("--step-ms", type=float, default=None,
                    help="measured single-chip step time (ms) at this "
                    "workload; enables the scaling bound")
    ap.add_argument("--ici-gbps", type=float, default=90.0,
                    help="per-chip ICI bandwidth assumption, GB/s "
                    "(v5e: 4 links x ~22.5 GB/s usable each direction)")
    ap.add_argument("--program", choices=["indexed", "host"],
                    default="indexed",
                    help="'indexed' = epoch_indexed_fn, the program "
                    "Trainer.fit ships and bench.py measures (HBM-pinned "
                    "base buckets + host-drawn indices); 'host' = the "
                    "legacy train_epoch host-staged program")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count="
                               f"{args.devices}").strip()

    from __graft_entry__ import _build_problem, _random_buckets
    from matcha_tpu.data.batcher import BucketedBatcher
    from matcha_tpu.parallel.mesh import make_mesh
    from matcha_tpu.sampler.bloom import build_bloom_dict
    from matcha_tpu.sampler.negative import ChromTable
    from matcha_tpu.train.runtime import Trainer, TrainSettings

    genome, dims, params, frozen = _build_problem(dim=args.dim, n_head=8,
                                                  chroms=args.chroms)
    mesh = make_mesh(args.devices // args.model, args.model)
    rng = np.random.default_rng(0)
    buckets = _random_buckets(genome, rng,
                              n_edges=args.steps * args.batch,
                              k_list=(2, 3, 4, 5))
    blooms = build_bloom_dict({k: v[0] for k, v in buckets.items()})
    trainer = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                      TrainSettings(alpha=1.0, beta=0.001), blooms=blooms,
                      mesh=mesh)
    batcher = BucketedBatcher(buckets, batch_size=args.batch,
                              num_batch_per_iter=args.steps)
    if args.program == "indexed":
        # the SHIPPED program: pinned base buckets + indexed epochs
        # (VERDICT r4 #7 — keep the paper bound attached to what fit runs)
        assert trainer.pin_base_buckets(batcher), "pin budget exceeded"
        lowered = trainer.lower_epoch_indexed(batcher)
    else:
        lowered = trainer.lower_train_epoch(batcher.next_epoch())
    hlo = lowered.compile().as_text()

    per_step, per_epoch = collect(hlo)
    total_step = sum(per_step.values())
    # collectives outside the scan body run once per EPOCH invocation (the
    # jitted program is one epoch): for the indexed program these are the
    # bulk index-gather reshards; amortize them over the epoch's steps
    total_epoch = sum(per_epoch.values())
    amortized = total_step + total_epoch / max(args.steps, 1)
    report = {
        "program": args.program,
        "mesh": {"data": args.devices // args.model, "model": args.model},
        "batch_per_bucket": args.batch,
        "steps_per_epoch": args.steps,
        "per_step_collective_bytes": per_step,
        "per_step_total_bytes": total_step,
        "per_epoch_collective_bytes": per_epoch,
        "per_epoch_total_bytes": total_epoch,
        "amortized_per_step_bytes": int(amortized),
    }
    if args.step_ms:
        t_comm_ms = amortized / (args.ici_gbps * 1e9) * 1e3
        bound = args.step_ms / (args.step_ms + t_comm_ms)
        report["scaling_bound"] = {
            "single_chip_step_ms": args.step_ms,
            "ici_gbps_assumed": args.ici_gbps,
            "comm_ms_no_overlap": round(t_comm_ms, 3),
            "efficiency_lower_bound": round(bound, 4),
        }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
