"""REAL-DATA training parity: our JAX framework vs the PyTorch reference,
both trained on the manuscript's own bundled SPRITE k-mer tuples
(ref History_version/data/SPRITE/tuples/occ_above_8.zip) with the legacy
frequency-band loading semantics (ref History_version/Code/main_SPRITE.py:
579-591,659-692):

  * per size s in 3..5, the band files ``<band>_filter_<s>.npy`` with the
    legacy per-size band-skip rules (:661-666); the bundle ships the
    [8,12] and "upper" bands;
  * weights = the bundled ``<band>_<s>_intra_inter.npy`` arrays (:686),
    mean-normalized x neg_num on BOTH sides (the current-gen treatment,
    ref Code/main.py:594-595);
  * 50/50 train/test split (:688);
  * membership (rejection) sets built from ALL loaded tuples (:648-651).

Both sides use the SAME node space (node2chrom.npy -> 2,745 hg38 1 Mb
bins over 23 chromosomes), the SAME clique-expansion features from the
train tuples (the bundle has no contact mcool; this is the legacy generic
feature path, ref main_drop.py:543-563 — fed identically to the torch
MultipleEmbedding and our FrozenTables), the current-gen model/training
(ref Code/Modules.py + Code/main.py two-stage), and sklearn metrics.
Negative draws differ only by RNG stream.

Usage: python scripts/real_data_parity.py [--cap 4000] [--stage2-epochs 8]
Prints a side-by-side per-size AUROC/AUPRC table; record in BASELINE.md.
"""

import argparse
import io
import json
import os
import sys
import time
import zipfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
sys.path.insert(0, os.path.join(HERE, "..", "tests"))

SPRITE_DIR = "/root/reference/History_version/data/SPRITE"
BANDS = [[3, 5], [5, 8], [8, 12], "upper"]   # ref main_SPRITE.py:581


def band_name(thresh):
    return "%d_%d" % tuple(thresh) if isinstance(thresh, list) else thresh


def load_bands(rng, cap, bands=None):
    """Tuples + intra_inter weights per size with the legacy skip rules
    (ref main_SPRITE.py:659-678); missing band files (the bundle ships
    8_12 + upper) are skipped like the reference would fail-fast on.

    ``bands`` restricts the loaded bands (--protocol upper passes
    ["upper"]: the freq>=12 slice carries learnable signal, while mixing
    the [8,12] band in floods positives with weak tuples whose
    chromosome-constrained corruptions keep k-1 strong members — both
    frameworks then sit just below chance, identically)."""
    z = zipfile.ZipFile(os.path.join(SPRITE_DIR, "tuples/occ_above_8.zip"))
    names = set(z.namelist())
    all_edges = {}      # full universe per size (membership sets)
    buckets = {}        # capped train material per size
    band_labels = {}    # per-row band name, aligned with buckets[size]
    for size in (3, 4, 5):
        rows, ws, bl = [], [], []
        for thresh in (bands if bands is not None else BANDS):
            if isinstance(thresh, list):
                if size == 3 and thresh[0] <= 5:
                    continue          # ref :663-664
                if size == 4 and thresh[0] <= 3:
                    continue          # ref :665-666
            nm = band_name(thresh)
            f_e = f"{nm}_filter_{size}.npy"
            f_w = f"{nm}_{size}_intra_inter.npy"
            if f_e not in names or f_w not in names:
                continue
            e = np.load(io.BytesIO(z.read(f_e)), allow_pickle=True)
            w = np.load(io.BytesIO(z.read(f_w)), allow_pickle=True)
            e = np.asarray(list(e), dtype=np.int64)
            rows.append(e)
            ws.append(np.asarray(w, np.float32).reshape(-1)[: len(e)])
            bl.append(np.full(len(e), nm, dtype=object))
        if not rows:
            continue
        e = np.concatenate(rows)
        w = np.concatenate(ws)
        b = np.concatenate(bl)
        # distinct sorted members (the invariant the sampler requires;
        # ref main_SPRITE.py:646-647 documents ids must be sorted)
        e.sort(axis=1)
        ok = (np.diff(e, axis=1) > 0).all(axis=1)
        e, w, b = e[ok], w[ok], b[ok]
        all_edges[size] = e.astype(np.int32)
        sel = rng.permutation(len(e))[:cap] if cap else rng.permutation(len(e))
        buckets[size] = (e[sel].astype(np.int32), w[sel])
        band_labels[size] = b[sel]
    return all_edges, buckets, band_labels


def node_space():
    n2c = np.load(os.path.join(SPRITE_DIR, "node2chrom.npy"),
                  allow_pickle=True).item()
    arr = np.zeros(max(n2c) + 1, np.int64)
    for node, c in n2c.items():
        arr[node] = c
    counts = np.bincount(arr[1:]).tolist()
    names = [f"chr{i + 1}" for i in range(len(counts))]
    assert (np.diff(arr[1:]) >= 0).all()
    return counts, names


def split_5050(buckets, rng, band_labels=None):
    train, test = {}, {}
    test_bands = {}
    for k, (e, w) in sorted(buckets.items()):
        idx = rng.permutation(len(e))
        s = len(idx) // 2                       # ref :688
        train[k] = (e[idx[:s]], w[idx[:s]])
        test[k] = (e[idx[s:]], w[idx[s:]])
        if band_labels is not None:
            test_bands[k] = band_labels[k][idx[s:]]
    return train, test, test_bands


def normalize_weights(train, test, neg_num=3):
    """The legacy driver trains UNWEIGHTED: its loss is loss_func(pred, y)
    with no weight argument (ref main_SPRITE.py:115-125), and the
    current-gen normalization lines are commented out there (:628-630).
    The bundled ``intra_inter`` arrays are 0/1 indicators used only to
    STRATIFY metrics (:200-201) — feeding them through the current-gen
    w/mean*neg_num treatment zeroes 99.9% of positive gradients and both
    frameworks sit below chance (measured, identically)."""
    f = lambda d: {k: (e, np.ones(len(e), np.float32))
                   for k, (e, w) in d.items()}
    return f(train), f(test)


# ------------------------------------------------------------------ jax side
def jax_train(space, dims, params, frozen, table, train_b, test_b, all_edges,
              *, stage1_epochs, stage2_epochs, steps, batch, seed):
    from matcha_tpu.data.batcher import BucketedBatcher
    from matcha_tpu.sampler.bloom import build_bloom_dict
    from matcha_tpu.train.runtime import Trainer, TrainSettings

    t0 = time.time()
    s1 = TrainSettings(alpha=0.0, beta=1.0, neg_num=3)
    tr1 = Trainer(params, frozen, dims, table, s1, blooms=None, seed=seed)
    tr1.fit(train_b, test_b, epochs=stage1_epochs, batch_size=batch,
            num_batch_per_iter=steps, log=lambda *_: None, seed=seed)
    blooms = build_bloom_dict(all_edges)        # ref :648-651 (ALL tuples)
    s2 = TrainSettings(alpha=1.0, beta=0.001, neg_num=3)
    tr2 = Trainer(tr1.state.params, frozen, dims, table, s2, blooms=blooms,
                  seed=seed + 1)
    hist = tr2.fit(train_b, test_b, epochs=stage2_epochs, batch_size=batch,
                   num_batch_per_iter=steps, log=lambda *_: None,
                   seed=seed + 1)
    return hist[-1]["valid"]["metrics"], time.time() - t0, tr2


# ---------------------------------------------------------------- torch side
def torch_train(space, intra, inter, train_b, test_b, all_edges, *,
                dim, n_head, stage1_epochs, stage2_epochs, steps, batch,
                seed):
    import torch
    import torch.nn.functional as F
    from baseline_torch import reference_generate_negative
    from reference_harness import build_torch_reference
    from matcha_tpu.train.metrics import size_stratified_metrics

    torch.manual_seed(seed)
    np.random.seed(seed)
    import random as _random
    _random.seed(seed)
    model = build_torch_reference(space, intra, inter, dim=dim, n_head=n_head)
    rng = np.random.default_rng(seed)
    ks = sorted(train_b.keys())
    empty_sets = {i: set() for i in range(max(ks) + 1)}
    member_sets = {i: set() for i in range(max(ks) + 1)}
    for k, e in all_edges.items():
        member_sets[k] = set(map(tuple, e.tolist()))

    def run_stage(alpha, beta, epochs, sets):
        opt = torch.optim.AdamW(model.parameters(), lr=1e-3)
        model.train()
        for _ in range(epochs):
            for _ in range(steps):
                for k in ks:
                    e, w = train_b[k]
                    idx = rng.integers(0, len(e), batch)
                    pos = e[idx].astype(np.int64)
                    neg = reference_generate_negative(
                        pos, sets, space, min_dis=0, neg_num=3)
                    x = torch.from_numpy(np.concatenate([pos, neg]))
                    y = torch.cat([torch.ones(len(pos), 1),
                                   torch.zeros(len(neg), 1)])
                    ww = torch.cat([torch.from_numpy(
                        w[idx].astype(np.float32)).reshape(-1, 1),
                        torch.ones(len(neg), 1)])
                    pred, recon = model(x, return_recon=True)
                    loss = (alpha * F.binary_cross_entropy_with_logits(
                        pred, y, weight=ww) + beta * recon)
                    opt.zero_grad()
                    loss.backward()
                    opt.step()

    t0 = time.time()
    run_stage(0.0, 1.0, stage1_epochs, empty_sets)   # ref :589,637-643
    run_stage(1.0, 0.001, stage2_epochs, member_sets)
    elapsed = time.time() - t0

    model.eval()
    preds, ys, sizes = [], [], []
    with torch.no_grad():
        for k in ks:
            e, w = test_b[k]
            take = min(len(e), 10_000 // len(ks))
            pos = e[rng.permutation(len(e))[:take]].astype(np.int64)
            neg = reference_generate_negative(
                pos, member_sets, space, min_dis=0, neg_num=3)
            x = torch.from_numpy(np.concatenate([pos, neg]))
            p = torch.sigmoid(model(x)).numpy().reshape(-1)
            preds.append(p)
            ys.append(np.concatenate([np.ones(len(pos)),
                                      np.zeros(len(neg))]))
            sizes.append(np.full(len(x), k, dtype=np.int32))
    metrics = size_stratified_metrics(np.concatenate(ys),
                                      np.concatenate(preds),
                                      np.concatenate(sizes))
    return metrics, elapsed, model


def fmt(m):
    keys = ["all"] + sorted(k for k in m if k != "all")
    return "  ".join(f"{k}: auroc {m[k]['auroc']:.3f} "
                     f"auprc {m[k]['auprc']:.3f}" for k in keys)


def shared_eval(trainer, tmodel, space, test_b, test_bands, all_edges,
                rng, cap_per_cell=20_000):
    """Per-(band, size) parity table on IDENTICAL eval sets: for every band
    x size cell, the SAME positives and the SAME reference-sampled negatives
    (baseline_torch.reference_generate_negative — the reference's own
    corruption + rejection semantics) are scored by both trained models, so
    the only degrees of freedom left are the learned parameters.
    Returns {(band, size): {"jax": (auroc, auprc), "torch": ...}, n}."""
    import torch
    from baseline_torch import reference_generate_negative
    from sklearn.metrics import average_precision_score, roc_auc_score

    import jax
    import jax.numpy as jnp
    from matcha_tpu.models.hypersagnn import encode_node_table, forward

    member_sets = {i: set() for i in range(max(all_edges) + 1)}
    for k, e in all_edges.items():
        member_sets[k] = set(map(tuple, e.tolist()))

    params, frozen, dims = trainer.state.params, trainer.frozen, trainer.dims
    node_table = encode_node_table(params, frozen, dims, train=False)

    @jax.jit
    def jax_logits(x):
        return forward(params, frozen, dims, x, train=False,
                       node_table=node_table)

    out = {}
    agg = {"jax": ([], []), "torch": ([], [])}
    tmodel.eval()
    for size in sorted(test_b):
        e, _ = test_b[size]
        bands_here = test_bands[size]
        for band in sorted(set(bands_here.tolist())):
            pos = e[bands_here == band]
            if len(pos) > cap_per_cell:
                pos = pos[rng.permutation(len(pos))[:cap_per_cell]]
            if len(pos) < 10:
                continue
            neg = reference_generate_negative(
                pos.astype(np.int64), member_sets, space, min_dis=0,
                neg_num=3)
            x = np.concatenate([pos.astype(np.int64), neg])
            y = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
            with torch.no_grad():
                pt = torch.sigmoid(tmodel(torch.from_numpy(x))
                                   ).numpy().reshape(-1)
            pj = np.asarray(jax.nn.sigmoid(
                jax_logits(jnp.asarray(x, jnp.int32)))).reshape(-1)
            cell = {}
            for nm, p in (("jax", pj), ("torch", pt)):
                cell[nm] = (roc_auc_score(y, p),
                            average_precision_score(y, p))
                agg[nm][0].append(y)
                agg[nm][1].append(p)
            cell["n_pos"] = len(pos)
            out[(band, size)] = cell
    for nm in ("jax", "torch"):
        y = np.concatenate(agg[nm][0])
        p = np.concatenate(agg[nm][1])
        out[("all", "all")] = out.get(("all", "all"), {})
        out[("all", "all")][nm] = (roc_auc_score(y, p),
                                   average_precision_score(y, p))
    return out


def main():
    # this JAX distro ignores the JAX_PLATFORMS env var; force via config
    # so a CPU parity run does not steal the tunneled TPU
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=4000,
                    help="max tuples per size (runtime control); 0 = no cap "
                         "(the full bundled dataset)")
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--n-head", type=int, default=4)
    ap.add_argument("--stage1-epochs", type=int, default=2)
    ap.add_argument("--stage2-epochs", type=int, default=8)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--protocol", choices=["bands", "upper"],
                    default="bands",
                    help="'bands' = the legacy main_SPRITE band mix; "
                         "'upper' = the freq>=12 slice only (learnable)")
    ap.add_argument("--feature-dropout-mode",
                    choices=["per_node", "per_occurrence"],
                    default="per_node",
                    help="jax-side feature-dropout placement A/B: "
                         "'per_occurrence' matches the reference exactly "
                         "(drawn per gathered row per batch, recon decoded "
                         "from the dropout-bearing token embedding)")
    args = ap.parse_args()

    from matcha_tpu.data.generic import (adjacency_features,
                                         build_generic_problem)

    rng = np.random.default_rng(args.seed)
    all_edges, buckets, band_labels = load_bands(
        rng, args.cap, bands=["upper"] if args.protocol == "upper" else None)
    counts, names = node_space()
    train_b, test_b, test_bands = split_5050(buckets, rng, band_labels)
    train_b, test_b = normalize_weights(train_b, test_b)
    print("sizes:", {k: (len(train_b[k][0]), len(test_b[k][0]))
                     for k in sorted(train_b)},
          "universe:", {k: len(v) for k, v in all_edges.items()})

    # one feature build, fed to BOTH frameworks (train edges only)
    train_rows = [list(map(int, r)) for k in sorted(train_b)
                  for r in train_b[k][0]]
    space, dims, params, frozen, table = build_generic_problem(
        counts, train_rows, dim=args.dim, n_head=args.n_head,
        type_names=names, seed=args.seed)
    if args.feature_dropout_mode != "per_node":
        dims = dims._replace(feature_dropout_mode=args.feature_dropout_mode)
        print(f"feature_dropout_mode = {dims.feature_dropout_mode}")
    sizes = [len(r) for r in train_rows]
    flat = np.concatenate([np.asarray(r) for r in train_rows]).astype(np.int32)
    offsets = np.zeros(len(sizes) + 1, np.int64)
    np.cumsum(sizes, out=offsets[1:])
    intra, inter = adjacency_features(space, flat, offsets)

    jm, jt, jtr = jax_train(space, dims, params, frozen, table, train_b,
                            test_b, all_edges,
                            stage1_epochs=args.stage1_epochs,
                            stage2_epochs=args.stage2_epochs,
                            steps=args.steps, batch=args.batch,
                            seed=args.seed)
    print(f"jax   ({jt:6.1f}s): {fmt(jm)}", flush=True)

    tm, tt, tmodel = torch_train(space, intra, inter, train_b, test_b,
                                 all_edges, dim=args.dim,
                                 n_head=args.n_head,
                                 stage1_epochs=args.stage1_epochs,
                                 stage2_epochs=args.stage2_epochs,
                                 steps=args.steps, batch=args.batch,
                                 seed=args.seed)
    print(f"torch ({tt:6.1f}s): {fmt(tm)}", flush=True)

    gap = {k: jm[k]["auroc"] - tm[k]["auroc"] for k in jm if k in tm}
    print(json.dumps({"auroc_gap_jax_minus_torch":
                      {str(k): round(v, 4) for k, v in gap.items()},
                      "jax_wall_s": round(jt, 1),
                      "torch_wall_s": round(tt, 1)}), flush=True)

    # per-(band, size) table on shared eval sets (VERDICT r3 #5)
    cells = shared_eval(jtr, tmodel, space, test_b, test_bands, all_edges,
                        rng)
    print("\nper-(band, size) on SHARED eval sets "
          "(same positives, same reference-sampled negatives):")
    print(f"{'band':>6} {'size':>4} {'n_pos':>7}  "
          f"{'jax auroc/auprc':>17}  {'torch auroc/auprc':>17}  {'gap':>7}")
    js = {}
    for (band, size), c in sorted(cells.items(), key=lambda kv: str(kv[0])):
        if band == "all":
            continue
        ja, jp = c["jax"]
        ta, tp = c["torch"]
        print(f"{band:>6} {size:>4} {c['n_pos']:>7}  "
              f"{ja:.3f} / {jp:.3f}      {ta:.3f} / {tp:.3f}     "
              f"{ja - ta:+.3f}")
        js[f"{band}_{size}"] = {"jax": [round(ja, 4), round(jp, 4)],
                                "torch": [round(ta, 4), round(tp, 4)],
                                "n_pos": c["n_pos"]}
    ja, jp = cells[("all", "all")]["jax"]
    ta, tp = cells[("all", "all")]["torch"]
    print(f"{'all':>6} {'all':>4} {'':>7}  "
          f"{ja:.3f} / {jp:.3f}      {ta:.3f} / {tp:.3f}     {ja - ta:+.3f}")
    js["all"] = {"jax": [round(ja, 4), round(jp, 4)],
                 "torch": [round(ta, 4), round(tp, 4)]}
    print(json.dumps({"shared_eval": js}), flush=True)


if __name__ == "__main__":
    main()
