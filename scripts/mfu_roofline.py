"""MFU / roofline arithmetic for the bench step, derived from shapes —
the checkable version of BASELINE.md's "MFU / roofline statement"
(round-2 VERDICT #10) and the 100 kb bytes/step roofline (VERDICT #6).

Two modes:
  * analytic (any backend): print FLOPs/step and HBM bytes/step per
    component from the workload geometry;
  * measured (TPU): additionally run the bench step and print attained
    TFLOP/s, MFU vs bf16 peak, and HBM-bandwidth utilization.

Usage:
  python scripts/mfu_roofline.py                 # 1 Mb bench geometry
  python scripts/mfu_roofline.py --config 100kb  # BASELINE config[3]
  python scripts/mfu_roofline.py --measure       # + run on the device

Peaks default to TPU v5e: 197 TFLOP/s bf16, 819 GB/s HBM.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 819.0


def geometry(config: str, batch: int):
    if config == "1mb":
        return dict(nodes=3067, chroms=23, batch=batch or 4096,
                    k_list=(2, 3, 4, 5), dim=64, heads=8, neg=3)
    if config == "100kb":
        return dict(nodes=30344, chroms=23, batch=batch or 2048,
                    k_list=(2, 3, 4, 5), dim=64, heads=8, neg=3)
    raise SystemExit(f"unknown --config {config}")


def flops_and_bytes(g):
    """Per-step model FLOPs and HBM traffic by component.

    Conventions: a (M,K)@(K,N) matmul = 2*M*K*N FLOPs; backward of a
    matmul = 2x fwd (two grad matmuls); the Pallas attention backward
    recomputes the forward in VMEM, so its FLOP cost = fwd + 2x grad
    matmuls ~= 3x fwd on the projection/fc1 terms (+1x recompute = 4x
    total, matching BASELINE.md's "x ~4").  Elementwise/VPU work
    (softmax, LN, tanh, masks) is not MXU FLOPs and is excluded from MFU
    (it is why the attention kernel's internal MXU utilization caps at
    ~35%); it IS included in the bytes estimate where it touches HBM.
    """
    d = g["dim"]
    h = g["heads"]
    B = g["batch"]
    rows_per_k = B * (1 + g["neg"])                  # pos + negatives
    comps = {}

    # ---- per-token stages over the merged stream: attr_nn + next_w +
    # pff_n1 (d->d->d) + classifier (d->1) + LN/tanh (VPU, excluded)
    T = sum(rows_per_k * k for k in g["k_list"])     # merged tokens
    per_token_matmul = (24 + d) * d + 3 * d * d + d * 1   # attr(25->d) ...
    comps["token_stages"] = dict(
        flops=4 * 2 * T * per_token_matmul,          # fwd + bwd(2x) + rcmp
        bytes=8 * T * d * 2)                         # ~8 stream passes bf16

    # ---- attention (k>=3 under merged; k=2 closed form = 2 matmuls)
    attn_f = 0
    for k in g["k_list"]:
        E = rows_per_k
        if k == 2:
            attn_f += 4 * 2 * E * 2 * (d * d + d * d)      # v-proj + fc1
        else:
            proj = 4 * d * (h * d // h)                    # q,k,v,fc1: 4 d*d
            attn_f += 4 * 2 * E * k * proj
    comps["attention"] = dict(flops=attn_f,
                              bytes=3 * T * d * 2)         # x in/out + grad

    # ---- node-table encode (per-chrom tied AE) + recon decode
    n = g["nodes"]
    enc = sum(2 * 2 * (n // g["chroms"]) * (n // g["chroms"]) * d
              for _ in range(g["chroms"]))                 # rough: n_c^2 d x2
    comps["node_encode"] = dict(flops=4 * enc,
                                bytes=2 * (n * n // g["chroms"]) * 4)
    F = n // g["chroms"] * 2                               # ~decode width
    comps["recon_decode"] = dict(flops=4 * 2 * n * d * F,
                                 bytes=n * F * 2)          # target slice bf16

    # ---- embedding gather + scatter VJP (MXU one-hot kernel)
    comps["gather_scatter"] = dict(flops=2 * T * 512,      # one-hot contract
                                   bytes=2 * T * d * 2 + n * d * 4)

    # ---- negative sampler + Bloom probes (no MXU FLOPs; HBM gathers)
    probe_rows = sum((4 if k == 2 else 2) * B * g["neg"] for k in g["k_list"])
    comps["sampler_bloom"] = dict(flops=0,
                                  bytes=probe_rows * 32)   # 32 B/transaction
    return comps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="1mb", choices=["1mb", "100kb"])
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--measure", action="store_true",
                    help="run the bench step on the device and report "
                         "attained MFU / bandwidth")
    ap.add_argument("--peak-tflops", type=float, default=V5E_BF16_TFLOPS)
    ap.add_argument("--peak-gbs", type=float, default=V5E_HBM_GBS)
    args = ap.parse_args()

    g = geometry(args.config, args.batch)
    comps = flops_and_bytes(g)
    tf = sum(c["flops"] for c in comps.values())
    tb = sum(c["bytes"] for c in comps.values())
    print(f"# geometry: {g}")
    print(f"{'component':16s} {'GFLOP/step':>12s} {'MB/step':>10s}")
    for name, c in comps.items():
        print(f"{name:16s} {c['flops'] / 1e9:12.2f} "
              f"{c['bytes'] / 1e6:10.1f}")
    print(f"{'TOTAL':16s} {tf / 1e9:12.2f} {tb / 1e6:10.1f}")
    t_flop_ms = tf / (args.peak_tflops * 1e12) * 1e3
    t_hbm_ms = tb / (args.peak_gbs * 1e9) * 1e3
    print(f"# compute roofline: {t_flop_ms:.2f} ms/step at "
          f"{args.peak_tflops:.0f} TFLOP/s bf16 peak")
    print(f"# bandwidth roofline: {t_hbm_ms:.2f} ms/step at "
          f"{args.peak_gbs:.0f} GB/s HBM peak")
    print(f"# binding roofline: "
          f"{'HBM' if t_hbm_ms > t_flop_ms else 'compute (MXU)'}")

    result = {"config": args.config, "gflop_per_step": round(tf / 1e9, 2),
              "mb_per_step": round(tb / 1e6, 1),
              "roofline_compute_ms": round(t_flop_ms, 3),
              "roofline_hbm_ms": round(t_hbm_ms, 3)}

    if args.measure:
        import time
        import jax
        from __graft_entry__ import _build_problem, _random_buckets
        from matcha_tpu.sampler.bloom import build_bloom_dict
        from matcha_tpu.sampler.negative import ChromTable
        from matcha_tpu.train.runtime import Trainer, TrainSettings
        from matcha_tpu.config import Config
        from matcha_tpu.pipeline import resolve_perf
        perf = resolve_perf(Config())
        res = 1_000_000 if args.config == "1mb" else 100_000
        genome, dims, params, frozen = _build_problem(
            dim=g["dim"], n_head=g["heads"], chroms=g["chroms"])
        if args.config == "100kb":
            # _build_problem is 1 Mb; the 100 kb measured path lives in
            # scripts/bench_100kb.py — reuse it for the measurement
            print("# for --config 100kb measured numbers use "
                  "scripts/bench_100kb.py")
            print(json.dumps(result))
            return
        dims = dims._replace(compute_dtype=perf["compute_dtype"],
                             use_pallas_attention=perf["use_pallas_attention"])
        rng = np.random.default_rng(0)
        buckets = _random_buckets(genome, rng, n_edges=4 * g["batch"],
                                  k_list=g["k_list"])
        blooms = build_bloom_dict({k: v[0] for k, v in buckets.items()})
        trainer = Trainer(params, frozen, dims, ChromTable.from_genome(genome),
                          TrainSettings(alpha=1.0, beta=0.001,
                                        token_stream=perf["token_stream"],
                                        propose_impl=perf["propose_impl"]),
                          blooms=blooms)
        trainer.prepare_device_epochs(buckets, batch_size=g["batch"],
                                      num_batch_per_iter=20)
        jax.device_get(trainer.train_epoch_device_launch()["bce"])  # warm
        t0 = time.time()
        jax.device_get(trainer.train_epoch_device_launch()["bce"])
        step_ms = (time.time() - t0) / 20 * 1e3
        attained_tflops = tf / (step_ms / 1e3) / 1e12
        mfu = attained_tflops / args.peak_tflops
        hbm_util = tb / (step_ms / 1e3) / (args.peak_gbs * 1e9)
        print(f"# measured: {step_ms:.2f} ms/step -> "
              f"{attained_tflops:.1f} TFLOP/s, MFU {mfu * 100:.1f}%, "
              f"HBM {hbm_util * 100:.1f}% of peak")
        result.update({"measured_ms_per_step": round(step_ms, 2),
                       "attained_tflops": round(attained_tflops, 1),
                       "mfu_pct": round(mfu * 100, 1),
                       "hbm_util_pct": round(hbm_util * 100, 1)})
    print(json.dumps(result))


if __name__ == "__main__":
    main()
