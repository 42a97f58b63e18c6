"""4DN-scale data-plane benchmark (VERDICT r3 #4).

The reference's raison d'etre is the 4DN SPRITE run: a multi-GB
``4DNFIBEVVTN5.clusters`` file parsed line-by-line and all-chrom k-mer
generation handled overnight by a 50-node-batch process pool
(ref Readme.md:30-31,45-64; Code/generate_kmers.py:100-132).  No egress
means the real file is unavailable, so this script GENERATES a 4DN-shaped
synthetic (hg38 all autosomes + chrX, >=10M clusters, multi-GB text,
SPRITE-like heavy-tailed cluster sizes with genomically-local members so
k-mer frequencies are realistic), then drives the real pipeline stages —
each in its own OS process for honest wall / peak-RSS accounting:

  1. process (genome + native mmap cluster parse + mcool ingest)
  2. kmers, single host (native packed-key sort-count, k=2..5)
  3. kmers, sharded over N worker processes + kmers-merge
     (the multi-host path), then verify shard-merge == single-host

Usage:
  python scripts/datascale_4dn.py --clusters 12000000 \
      [--workdir /tmp/matcha_datascale] [--shards 4] [--keep]

Results are printed as a table + one JSON line for BASELINE.md.
"""

import argparse
import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

HG38 = [248_956_422, 242_193_529, 198_295_559, 190_214_555, 181_538_259,
        170_805_979, 159_345_973, 145_138_636, 138_394_717, 133_797_422,
        135_086_622, 133_275_309, 114_364_328, 107_043_718, 101_991_189,
        90_338_345, 83_257_441, 80_373_285, 58_617_616, 64_444_167,
        46_709_983, 50_818_468, 156_040_895]
NAMES = [f"chr{i+1}" for i in range(22)] + ["chrX"]
RES = 1_000_000

# distinct-bins-per-cluster distribution: SPRITE-shaped (mostly pairs and
# small multiway contacts, a thin tail up to the reference's
# max_cluster_size=25).  The tail mass is the k-mer cost driver: C(25,5)
# = 53,130 5-mers per size-25 cluster.
SIZES = list(range(2, 26))
PROBS = ([0.37, 0.18, 0.12, 0.09, 0.07, 0.05, 0.04, 0.03, 0.02]
         + [0.0024] * 5           # 11..15
         + [0.0001] * 10)         # 16..25
PROBS = [p / sum(PROBS) for p in PROBS]


def expected_enumerations(n_clusters):
    from math import comb
    out = {}
    for k in (2, 3, 4, 5):
        out[k] = n_clusters * sum(p * comb(s, k)
                                  for s, p in zip(SIZES, PROBS) if s >= k)
    return out


def generate_clusters(path, n_clusters, seed=0, chunk=200_000):
    """Write the synthetic .clusters file: per cluster, a chromosome
    (length-weighted), an anchor, s distinct bins from a ~2s-bin local
    window (SPRITE contacts are genomically clustered — this also gives
    k-mers realistic repeat frequencies), and 1..8 reads per bin at random
    intra-bin coordinates.  ~3% of clusters get 20x read duplication
    (PCR-duplicate-shaped lines; the reference's raw-length prefilter at
    max_cluster_size*50 still passes them)."""
    rng = np.random.default_rng(seed)
    bins = np.array([s // RES + 1 for s in HG38])
    chrom_p = bins / bins.sum()
    t0 = time.time()
    n_written = 0
    cid = 0
    with open(path, "w", buffering=1 << 22) as f:
        while n_written < n_clusters:
            c = min(chunk, n_clusters - n_written)
            s_draw = rng.choice(SIZES, c, p=PROBS)
            chrom = rng.choice(len(HG38), c, p=chrom_p)
            dup = rng.random(c) < 0.03
            lines = []
            for s in np.unique(s_draw):
                sel = np.flatnonzero(s_draw == s)
                ch = chrom[sel]
                w = int(2 * s + 2)
                anchors = (rng.random(sel.size)
                           * np.maximum(bins[ch] - w, 1)).astype(np.int64)
                # s distinct offsets in [0, w) per cluster
                offs = np.argsort(rng.random((sel.size, w)),
                                  axis=1)[:, :s]
                node_bins = anchors[:, None] + offs             # (m, s)
                reads = rng.integers(1, 9, (sel.size, s))
                intra = rng.integers(0, RES, (sel.size, s))
                coords = node_bins * RES + intra
                for j in range(sel.size):
                    r = reads[j]
                    if dup[sel[j]]:
                        r = r * 20
                    name = NAMES[ch[j]]
                    parts = []
                    for b in range(s):
                        parts.extend([f"{name}:{coords[j, b]}"] * int(r[b]))
                    lines.append((sel[j], "\t".join(parts)))
            lines.sort()                     # restore draw order
            f.write("".join(f"cl{cid + i}\t{body}\n"
                            for i, body in lines))
            cid += c
            n_written += c
            if n_written % 2_000_000 < chunk:
                print(f"  generated {n_written:,} clusters "
                      f"({time.time() - t0:.0f}s)", file=sys.stderr)
    return os.path.getsize(path)


def generate_mcool(path, seed=1):
    """hg38 1 Mb mcool: distance-decay intra pixels (band <= 100 bins) +
    sparse trans pixels; both count and balanced columns."""
    import h5py
    rng = np.random.default_rng(seed)
    bins = [s // RES + 1 for s in HG38]
    chrom_idx, starts, first = [], [], []
    tot = 0
    for c, nb in enumerate(bins):
        first.append(tot)
        chrom_idx += [c] * nb
        starts += (np.arange(nb) * RES).tolist()
        tot += nb
    i_list, j_list, v_list = [], [], []
    for c, nb in enumerate(bins):
        i0 = first[c]
        for d in range(0, min(100, nb)):
            i = np.arange(nb - d) + i0
            v = rng.gamma(2.0, 50.0 / (1 + d), nb - d)
            i_list.append(i)
            j_list.append(i + d)
            v_list.append(v)
    m = 2_000_000
    ti = rng.integers(0, tot, m)
    tj = rng.integers(0, tot, m)
    lo, hi = np.minimum(ti, tj), np.maximum(ti, tj)
    keep = lo != hi
    i_list.append(lo[keep])
    j_list.append(hi[keep])
    v_list.append(rng.gamma(1.2, 1.0, int(keep.sum())))
    ii = np.concatenate(i_list)
    jj = np.concatenate(j_list)
    vv = np.concatenate(v_list)
    order = np.lexsort((jj, ii))
    ii, jj, vv = ii[order], jj[order], vv[order]
    with h5py.File(path, "w") as f:
        grp = f.create_group("resolutions").create_group(str(RES))
        b = grp.create_group("bins")
        b.create_dataset("chrom", data=np.array(chrom_idx))
        b.create_dataset("start", data=np.array(starts))
        b.create_dataset("end", data=np.array(starts) + RES)
        # balanced weights column (the reference prefers balanced pixels)
        b.create_dataset("weight", data=np.ones(tot))
        ch = grp.create_group("chroms")
        ch.create_dataset("name", data=[n.encode() for n in NAMES])
        pix = grp.create_group("pixels")
        pix.create_dataset("bin1_id", data=ii)
        pix.create_dataset("bin2_id", data=jj)
        pix.create_dataset("count", data=vv)
        pix.create_dataset("balanced", data=vv)
    return os.path.getsize(path), len(ii)


def run_stage(argv, env=None):
    """Run one pipeline CLI stage in its own process; returns
    (wall_s, peak_rss_mb, stdout_tail)."""
    code = (
        "import resource, runpy, sys, time, json\n"
        f"sys.argv = ['matcha_tpu'] + {argv!r}\n"
        "t0 = time.time()\n"
        "runpy.run_module('matcha_tpu', run_name='__main__')\n"
        "print('STAGE_STATS ' + json.dumps({'wall': time.time() - t0,"
        " 'maxrss_mb': resource.getrusage(resource.RUSAGE_SELF).ru_maxrss"
        " / 1024.0,"
        " 'child_maxrss_mb': resource.getrusage("
        "resource.RUSAGE_CHILDREN).ru_maxrss / 1024.0}))\n")
    e = dict(os.environ)
    e.setdefault("JAX_PLATFORMS", "cpu")
    if env:
        e.update(env)
    p = subprocess.Popen([sys.executable, "-c", code], env=e,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
    # Sample the whole process TREE's co-resident RSS (ru_maxrss of
    # RUSAGE_CHILDREN only reports the single largest child — with a
    # worker pool the honest peak is parent + all live workers at once)
    peak_tree = [0.0]
    stop = threading.Event()

    def _sample():
        while not stop.is_set():
            total = 0.0
            try:
                ppids = {}
                rss = {}
                for d in os.listdir("/proc"):
                    if not d.isdigit():
                        continue
                    try:
                        with open(f"/proc/{d}/status") as f:
                            pp = rs = None
                            for line in f:
                                if line.startswith("PPid:"):
                                    pp = int(line.split()[1])
                                elif line.startswith("VmRSS:"):
                                    rs = int(line.split()[1]) / 1024.0
                            ppids[int(d)] = pp
                            rss[int(d)] = rs or 0.0
                    except (OSError, ValueError):
                        continue
                live = {p.pid}
                grew = True
                while grew:
                    grew = False
                    for pid, pp in ppids.items():
                        if pp in live and pid not in live:
                            live.add(pid)
                            grew = True
                total = sum(rss.get(pid, 0.0) for pid in live)
            except OSError:
                pass
            peak_tree[0] = max(peak_tree[0], total)
            stop.wait(0.2)

    th = threading.Thread(target=_sample, daemon=True)
    th.start()
    out, err = p.communicate()
    stop.set()
    th.join(timeout=2)
    if p.returncode != 0:
        print(out[-3000:], file=sys.stderr)
        print(err[-3000:], file=sys.stderr)
        raise RuntimeError(f"stage {argv} failed")
    stats = None
    for line in out.splitlines():
        if line.startswith("STAGE_STATS "):
            stats = json.loads(line[len("STAGE_STATS "):])
    rss = max(stats["maxrss_mb"], peak_tree[0])
    return stats["wall"], rss, out[-1500:]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clusters", type=int, default=12_000_000)
    ap.add_argument("--workdir", default="/tmp/matcha_datascale")
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--skip-generate", action="store_true")
    ap.add_argument("--skip-sharded", action="store_true")
    ap.add_argument("--merge-workers", type=int,
                    default=min(4, os.cpu_count() or 1),
                    help="process-parallel buckets in the shard merge "
                         "(0 = serial streaming)")
    args = ap.parse_args()

    wd = args.workdir
    os.makedirs(wd, exist_ok=True)
    cl_path = os.path.join(wd, "synth4dn.clusters")
    mc_path = os.path.join(wd, "synth4dn.mcool")
    sizes_path = os.path.join(wd, "sizes.txt")
    cfg_path = os.path.join(wd, "config.JSON")
    temp_dir = os.path.join(wd, "Temp")

    exp = expected_enumerations(args.clusters)
    print("expected k-mer enumerations:",
          {k: f"{v / 1e9:.2f}B" for k, v in exp.items()})

    results = {"n_clusters": args.clusters}
    if not args.skip_generate or not os.path.exists(cl_path):
        print("generating .clusters ...")
        t0 = time.time()
        size = generate_clusters(cl_path, args.clusters)
        results["gen_clusters_s"] = round(time.time() - t0, 1)
        results["clusters_gb"] = round(size / 1e9, 2)
        print(f"  {size / 1e9:.2f} GB in {results['gen_clusters_s']}s")
        print("generating .mcool ...")
        t0 = time.time()
        msize, npix = generate_mcool(mc_path)
        results["mcool_gb"] = round(msize / 1e9, 2)
        results["mcool_pixels"] = npix
        print(f"  {msize / 1e9:.2f} GB, {npix:,} pixels "
              f"({time.time() - t0:.0f}s)")
    else:
        results["clusters_gb"] = round(os.path.getsize(cl_path) / 1e9, 2)

    with open(sizes_path, "w") as f:
        f.write("".join(f"{n}\t{s}\n" for n, s in zip(NAMES, HG38)))
    cfg = {"cluster_path": cl_path, "mcool_path": mc_path,
           "resolution": RES, "chrom_list": NAMES, "chrom_size": sizes_path,
           "temp_dir": temp_dir, "max_cluster_size": 25, "min_distance": 0,
           "k-mer_size": [2, 3, 4, 5], "min_freq_cutoff": 2,
           "quantile_cutoff_for_positive": 0.6,
           "quantile_cutoff_for_unlabel": 0.4, "embed_dim": 64}
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    print("stage 1: process (native cluster parse + mcool ingest)")
    wall, rss, _ = run_stage(["process", "-c", cfg_path])
    gb = results["clusters_gb"]
    results["process_s"] = round(wall, 1)
    results["process_rss_mb"] = round(rss)
    results["process_gb_per_s"] = round(gb / wall, 3)
    print(f"  {wall:.1f}s  ({gb / wall:.2f} GB/s incl. mcool)  "
          f"peak RSS {rss:.0f} MB")
    n_parsed = len(np.load(os.path.join(temp_dir, "edge_offsets.npy"))) - 1
    results["clusters_parsed"] = int(n_parsed)
    print(f"  clusters kept: {n_parsed:,}")

    print("stage 2: kmers single-host (native, k=2..5)")
    wall, rss, out = run_stage(["kmers", "-c", cfg_path])
    results["kmers_single_s"] = round(wall, 1)
    results["kmers_single_rss_mb"] = round(rss)
    print(f"  {wall:.1f}s  peak RSS {rss:.0f} MB")
    print("  " + "\n  ".join(line for line in out.splitlines()
                             if line.startswith("k=")))
    single = {k: (np.load(os.path.join(temp_dir, f"all_{k}_counter.npy")),
                  np.load(os.path.join(temp_dir,
                                       f"all_{k}_freq_counter.npy")))
              for k in (2, 3, 4, 5)}
    results["kmers_counts"] = {k: int(len(v[1])) for k, v in single.items()}
    total_enum = {k: float(v[1].sum()) for k, v in single.items()}
    results["kmers_enumerated_above_cutoff"] = {
        k: round(v / 1e9, 3) for k, v in total_enum.items()}

    if not args.skip_sharded:
        print(f"stage 3: kmers sharded over {args.shards} worker processes "
              "+ merge (the multi-host path)")
        t0 = time.time()
        procs = []
        for i in range(args.shards):
            code = (
                "import resource, runpy, sys, time, json\n"
                f"sys.argv = ['matcha_tpu', 'kmers', '-c', {cfg_path!r},"
                f" '--shard-index', '{i}', '--shard-count',"
                f" '{args.shards}']\n"
                "runpy.run_module('matcha_tpu', run_name='__main__')\n"
                "print('SHARD_RSS', resource.getrusage("
                "resource.RUSAGE_SELF).ru_maxrss / 1024.0)\n")
            e = dict(os.environ, JAX_PLATFORMS="cpu",
                     OMP_NUM_THREADS=str(max(1, os.cpu_count()
                                             // args.shards)))
            procs.append(subprocess.Popen([sys.executable, "-c", code],
                                          env=e, stdout=subprocess.PIPE,
                                          text=True))
        rss_shards = []
        for p in procs:
            out, _ = p.communicate()
            assert p.returncode == 0, out[-2000:]
            for line in out.splitlines():
                if line.startswith("SHARD_RSS"):
                    rss_shards.append(float(line.split()[1]))
        shard_wall = time.time() - t0
        wall, rss, _ = run_stage(
            ["kmers-merge", "-c", cfg_path,
             "--shard-count", str(args.shards)],
            env={"MATCHA_MERGE_WORKERS": str(args.merge_workers)})
        results["kmers_shard_s"] = round(shard_wall, 1)
        results["kmers_shard_rss_mb"] = round(max(rss_shards))
        results["kmers_merge_s"] = round(wall, 1)
        results["kmers_merge_rss_mb"] = round(rss)
        print(f"  shards {shard_wall:.1f}s (peak RSS/shard "
              f"{max(rss_shards):.0f} MB)  merge {wall:.1f}s "
              f"(RSS {rss:.0f} MB)")
        ok = True
        for k in (2, 3, 4, 5):
            m = (np.load(os.path.join(temp_dir, f"all_{k}_counter.npy")),
                 np.load(os.path.join(temp_dir, f"all_{k}_freq_counter.npy")))
            ok &= np.array_equal(m[0], single[k][0])
            ok &= np.array_equal(m[1], single[k][1])
        results["shard_merge_equals_single"] = bool(ok)
        print(f"  shard-merge == single-host: {ok}")
        assert ok

    print(json.dumps(results))


if __name__ == "__main__":
    main()
