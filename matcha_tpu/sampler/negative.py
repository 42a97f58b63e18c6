"""Batched on-device negative hyperedge sampler.

Device-resident, fixed-shape re-design of the reference's per-sample Python
rejection loop (ref: Code/main.py:361-459):

  * per positive, ``neg_num`` negatives
  * number of corrupted positions ~ Binomial(k, 0.5) truncated to nonzero
    (ref :371-374); positions chosen once per negative, without replacement
    (ref :389) and held fixed across retries
  * each retry resamples the chosen positions uniformly within the **same
    chromosome's node range** as the original member (ref :403-407)
  * candidate accepted iff, after sorting, all adjacent gaps exceed
    ``min_distance`` (which for min_distance >= 0 also enforces distinctness,
    ref :410-421) and the candidate is NOT in the membership Bloom filter
    for its size (ref :392)
  * the reference's loop is unbounded; here ``max_trials`` candidate rounds
    are proposed IN PARALLEL and the first acceptable one selected (with a
    structurally-valid fallback) — fixed cost, no sequential dependency,
    statistically indistinguishable at real rejection rates

With no filter (stage 1 of training, ref Code/main.py:589), negatives are
copies of the positives, exactly as the reference's empty-set dicts produce.
All shapes are static: (B*neg_num, k) per size bucket.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tpu.sampler.bloom import DeviceBloomFilter


class ChromTable(NamedTuple):
    """Device metadata for chromosome-constrained resampling.

    node2chrom: (N+1,) int32 — chromosome index per node id (0 row unused)
    chrom_start/chrom_end: (C,) int32 — [start, end) node-id range per chrom
    (semantics of chrom_range, ref Code/process.py:25-33)
    """
    node2chrom: jnp.ndarray
    chrom_start: jnp.ndarray
    chrom_end: jnp.ndarray

    @classmethod
    def from_genome(cls, genome) -> "ChromTable":
        return cls(node2chrom=jnp.asarray(genome.node2chrom, dtype=jnp.int32),
                   chrom_start=jnp.asarray(genome.chrom_range[:, 0], jnp.int32),
                   chrom_end=jnp.asarray(genome.chrom_range[:, 1], jnp.int32))


@lru_cache(maxsize=None)
def _truncated_binomial_cdf(k: int) -> np.ndarray:
    """CDF of Binomial(k, 1/2) conditioned on > 0, over support 1..k."""
    pmf = np.array([math.comb(k, c) for c in range(k + 1)], dtype=np.float64)
    pmf = pmf / pmf.sum()
    pmf = pmf[1:] / (1.0 - pmf[0])
    return np.cumsum(pmf)


# optimal sorting networks (compare-exchange index pairs) for tiny widths;
# jnp.sort lowers to a general sort HLO that is far slower on TPU than a
# handful of vectorized min/max ops over (N, k) columns
_SORT_NETS = {
    1: [],
    2: [(0, 1)],
    3: [(0, 2), (0, 1), (1, 2)],
    4: [(0, 2), (1, 3), (0, 1), (2, 3), (1, 2)],
    5: [(0, 3), (1, 4), (0, 2), (1, 3), (0, 1), (2, 4), (1, 2), (3, 4),
        (2, 3)],
    6: [(0, 5), (1, 3), (2, 4), (1, 2), (3, 4), (0, 3), (2, 5), (0, 1),
        (2, 3), (4, 5), (1, 2), (3, 4)],
}


def sort_small(x: jnp.ndarray) -> jnp.ndarray:
    """Sort the trailing axis (width <= 6) with a fixed sorting network."""
    k = x.shape[-1]
    if k not in _SORT_NETS:
        return jnp.sort(x, axis=-1)
    cols = [x[..., i] for i in range(k)]
    for i, j in _SORT_NETS[k]:
        lo = jnp.minimum(cols[i], cols[j])
        hi = jnp.maximum(cols[i], cols[j])
        cols[i], cols[j] = lo, hi
    return jnp.stack(cols, axis=-1)


def _first_accepted(probe, acc_stage, expand):
    """First Bloom-accepted stage per row (ascending trial order, selected
    without gathers).  probe: (S, ...) per-stage candidates; acc_stage:
    (S, n) acceptance; expand: maps an (n,) mask to probe's stage shape.
    Fallback rows (no acceptance) keep probe[0], the first structurally-
    valid candidate.  Returns (chosen, acc_found)."""
    acc_found = jnp.zeros(acc_stage.shape[1:], bool)
    chosen = probe[0]
    for s in range(probe.shape[0]):
        take = ~acc_found & acc_stage[s]
        chosen = jnp.where(expand(take), probe[s], chosen)
        acc_found = acc_found | acc_stage[s]
    return chosen, acc_found


def _sample_change_mask(key: jax.Array, n: int, k: int) -> jnp.ndarray:
    """(n, k) bool mask with row-wise count ~ truncated Binomial(k, 1/2),
    positions uniform without replacement."""
    kc, kp = jax.random.split(key)
    cdf = jnp.asarray(_truncated_binomial_cdf(k), dtype=jnp.float32)
    u = jax.random.uniform(kc, (n,))
    # #{j: cdf[j] < u} == searchsorted(cdf, u, side="left"), identical
    # values; the compare-count fuses where searchsorted lowers to a
    # log2(k)-iteration while loop of gathers (see walks/skipgram.py)
    change_num = jnp.sum((u[:, None] > cdf).astype(jnp.int32), axis=-1) + 1
    # random ranks: position j is corrupted iff its rank < change_num.
    # rank by O(k^2) pairwise compare-counts (index tie-break) instead of a
    # double argsort — jnp.argsort lowers to a general sort HLO, far
    # costlier on TPU than k^2 vectorized compares for k <= 5, and the rank
    # vector of iid uniforms is a uniform permutation either way
    scores = jax.random.uniform(kp, (n, k))
    s_i = scores[:, :, None]                                    # (n, k, 1)
    s_j = scores[:, None, :]                                    # (n, 1, k)
    less = (s_j < s_i) | ((s_j == s_i)
                          & (jnp.arange(k)[None, :] < jnp.arange(k)[:, None]))
    ranks = jnp.sum(less, axis=-1)                              # (n, k)
    return ranks < change_num[:, None]


def sample_negatives_with_stats(
        key: jax.Array, positives: jnp.ndarray, table: ChromTable,
        min_distance: int, bloom: Optional[DeviceBloomFilter], *,
        neg_num: int = 3, max_trials: int = 8, hard_ratio: float = 1.0,
        extra_rounds: int = 32, max_probes: Optional[int] = None,
        chrom_bounds: Optional[tuple] = None,
        propose_impl: str = "xla") -> Tuple[jnp.ndarray, dict]:
    """Generate (B*neg_num, k) negatives for a (B, k) positive bucket.

    hard_ratio: fraction of negatives corrupted chromosome-constrained at the
    binomially-chosen positions ("hard"); the rest are wholly random
    hyperedges over the full node range ("simple") — the legacy pair_ratio
    mixing (ref History_version/Code/main_SPRITE.py:423-449).  The current
    reference pipeline uses hard_ratio=1.0.

    propose_impl: "xla" (default) or "pallas" — the fused feature-major
    phase-1 kernel (ops/propose.py; falls back to "xla" when the row count
    has no supported block width).  Distribution-identical; streams differ.

    Returns (negatives, stats) where stats counts the rows that exhausted
    every trial: ``bloom_fallback`` = rows that ended on a structurally-valid
    Bloom-HIT candidate (a likely positive labeled y=0 — the silent-mislabel
    risk the reference avoids by looping forever, Code/main.py:392-421) and
    ``orig_fallback`` = rows that fell back to the positive itself.  ``rows``
    is the per-call denominator.
    """
    if propose_impl not in ("xla", "pallas"):
        # an unknown value silently running XLA would invalidate any
        # pallas-vs-xla A/B that believes it measured the kernel
        raise ValueError(f"propose_impl must be 'xla' or 'pallas', "
                         f"got {propose_impl!r}")
    b, k = positives.shape
    n = b * neg_num
    orig = jnp.tile(positives, (neg_num, 1)).astype(jnp.int32)
    zero = jnp.zeros((), jnp.int32)

    if bloom is None:
        # stage-1 semantics: empty rejection dicts -> negatives == positives
        return orig, {"bloom_fallback": zero, "orig_fallback": zero,
                      "rows": jnp.asarray(n, jnp.int32)}

    key, km = jax.random.split(key)
    change = _sample_change_mask(km, n, k)

    # per-member chromosome range WITHOUT table gathers: node ids are
    # assigned contiguously per chromosome (ref Code/process.py:25-33), so
    # lo/hi are a C-step monotone function of the id — C unrolled
    # compare-selects on the VPU instead of 3 latency-bound random gathers
    # (~7 ns/row x n*k rows was ~1.2 ms/step at bench scale).  Needs the
    # ranges as host constants: the Trainer passes them via
    # ``chrom_bounds`` (ChromTable itself is a jit ARGUMENT — gigabyte-free
    # compile — so its fields are tracers inside the step); eager callers
    # with a concrete table get them extracted here.  Traced tables with no
    # bounds keep the gather path.
    if chrom_bounds is None:
        try:
            chrom_bounds = tuple(
                (int(s), int(e)) for s, e in
                zip(np.asarray(table.chrom_start), np.asarray(table.chrom_end)))
        except jax.errors.TracerArrayConversionError:
            pass
    if chrom_bounds is not None:
        lo = jnp.full(orig.shape, float(chrom_bounds[0][0]), jnp.float32)
        hi = jnp.full(orig.shape, float(chrom_bounds[0][1]), jnp.float32)
        for start, end in chrom_bounds[1:]:
            on_c = orig >= int(start)
            lo = jnp.where(on_c, float(start), lo)
            hi = jnp.where(on_c, float(end), hi)
    else:
        chrom = table.node2chrom[orig]               # (n, k)
        lo = table.chrom_start[chrom].astype(jnp.float32)
        hi = table.chrom_end[chrom].astype(jnp.float32)
    if hard_ratio < 1.0:
        key, kh = jax.random.split(key)
        hard = jax.random.uniform(kh, (n, 1)) <= hard_ratio
        num_nodes = table.node2chrom.shape[0]        # N + 1
        change = change | ~hard                      # simple: corrupt all
        lo = jnp.where(hard, lo, 1.0)                # simple: whole range
        hi = jnp.where(hard, hi, float(num_nodes))

    def propose(k_round):
        """One candidate per row at the FIXED corruption positions (the
        reference re-randomizes values, not positions, Code/main.py:389-407);
        returns (sorted candidate, gaps-ok, accepted)."""
        u = jax.random.uniform(k_round, (n, k))
        # min() guard: f32 rounding can make (hi-lo)*u == hi-lo for u near
        # 1, which would land cand on hi itself — the next chromosome's
        # first node (or one past the table on the last chromosome)
        cand = (lo + jnp.minimum(jnp.floor((hi - lo) * u),
                                 hi - lo - 1.0)).astype(jnp.int32)
        t = sort_small(jnp.where(change, cand, orig))
        ok = jnp.all(jnp.diff(t, axis=-1) > min_distance, axis=-1)
        return t, ok, ok & ~bloom.contains(t)

    # Phase 1: T trial rounds proposed IN PARALLEL (cheap VPU work: RNG +
    # sorting networks + gap checks), but only the first S structurally-valid
    # candidates per row are Bloom-PROBED — the probe is a random HBM gather,
    # latency-bound at ~7 ns/row on TPU, and is the sampler's dominant cost;
    # struct-fail trials can never be accepted, so probing them is pure
    # waste.  Selecting the first struct-ok candidate that Bloom-misses is
    # distribution-identical to the reference's propose-until-clean loop
    # (iid proposals, first-acceptance order preserved); rows whose first S
    # struct-ok candidates all hit the filter fall through to phase 2, which
    # draws fresh iid proposals — also distribution-preserving.  Dense
    # unlabeled sets (chromosome-constrained k=2 at 1 Mb can see 30-50%
    # bloom-hit rates) are why S stays configurable per size.
    T = max(1, min(int(max_trials), 16))
    S = T if max_probes is None else max(1, min(int(max_probes), T))
    key, kt = jax.random.split(key)
    use_pallas = False
    if propose_impl == "pallas":
        from matcha_tpu.ops.propose import propose_phase1, supported_block
        use_pallas = k in _SORT_NETS and supported_block(n) > 0
        if not use_pallas:
            import warnings
            warnings.warn(
                f"propose_impl='pallas' fell back to XLA (n={n} has no "
                f"supported block width, or k={k} > 6)", stacklevel=2)
    if use_pallas:
        # feature-major fused kernel (ops/propose.py): the whole propose/
        # sort/gap/stage chain in one VMEM pass with n on the lane axis;
        # distribution-identical to the XLA path (fresh iid uniforms, same
        # first-acceptance order), stream differs (u drawn (T, k, n))
        u_t = jax.random.uniform(kt, (T, k, n))
        probe_t, has_t = propose_phase1(
            orig.T, change.T.astype(jnp.int32), lo.T, hi.T, u_t,
            min_distance=min_distance, max_probes=S)       # (S, k, n)
        acc_stage = has_t & ~bloom.contains_cols(probe_t)  # (S, n)
        chosen_t, acc_found = _first_accepted(probe_t, acc_stage,
                                              lambda m: m[None, :])
        chosen = chosen_t.T                                # (n, k)
        ok_found = has_t[0]      # any struct-ok trial exists
    else:
        u = jax.random.uniform(kt, (T, n, k))
        # same f32-rounding guard as in propose(): never land on hi itself
        cand = (lo[None] + jnp.minimum(jnp.floor((hi - lo)[None] * u),
                                       (hi - lo - 1.0)[None])).astype(jnp.int32)
        temp = jnp.where(change[None], cand, orig[None])    # (T, n, k)
        temp = sort_small(temp)
        ok = jnp.all(jnp.diff(temp, axis=-1) > min_distance, axis=-1)  # (T, n)

        # s-th structurally-valid trial per row (trial order), s = 0..S-1 —
        # selected with unrolled masked sums, NOT take_along_axis: an XLA
        # gather over the (T, n, k) tensor would cost the same latency-bound
        # HBM path the staged probing is here to avoid.
        rank = jnp.cumsum(ok, axis=0) - 1                   # (T, n)
        probe_rows, stage_has = [], []
        for s in range(S):
            m = ok & (rank == s)                            # (T, n)
            sel = jnp.zeros((n, k), jnp.int32)
            for t_ in range(T):
                sel = sel + jnp.where(m[t_][:, None], temp[t_], 0)
            probe_rows.append(sel)
            stage_has.append(jnp.any(m, axis=0))
        probe = jnp.stack(probe_rows)                       # (S, n, k)
        acc_stage = jnp.stack(stage_has) & ~bloom.contains(probe)     # (S, n)
        chosen, acc_found = _first_accepted(probe, acc_stage,
                                            lambda m: m[:, None])
        ok_found = stage_has[0]  # any struct-ok trial exists

    # Phase 2: bounded sequential re-trial of ONLY the still-unaccepted rows
    # (one proposal per round, merged into failed rows) — the device analogue
    # of the reference's loop-until-clean, with an iteration cap.  In the
    # common case every row cleared phase 1 and the loop body never runs.
    if extra_rounds > 0:
        key, kw = jax.random.split(key)

        def w_cond(carry):
            i, _, found, _, _ = carry
            return (i < extra_rounds) & jnp.any(~found)

        def w_body(carry):
            i, k_, found, cur, cur_ok = carry
            k_, kp = jax.random.split(k_)
            t, ok_r, acc_r = propose(kp)
            take = ~found & acc_r
            # a row with no structurally-valid candidate yet stores its first
            # one (even if Bloom-hit) so the final fallback is always valid
            take_ok = ~found & ~cur_ok & ok_r
            cur = jnp.where((take | take_ok)[:, None], t, cur)
            return i + 1, k_, found | take, cur, cur_ok | (~found & ok_r)

        _, _, acc_found, chosen, ok_found = jax.lax.while_loop(
            w_cond, w_body,
            (jnp.zeros((), jnp.int32), kw, acc_found, chosen, ok_found))

    use_orig = ~(acc_found | ok_found)
    neg = jnp.where(use_orig[:, None], orig, chosen)
    stats = {
        "bloom_fallback": jnp.sum(~acc_found & ok_found).astype(jnp.int32),
        "orig_fallback": jnp.sum(use_orig).astype(jnp.int32),
        "rows": jnp.asarray(n, jnp.int32),
    }
    return neg, stats


def sample_negatives(key: jax.Array, positives: jnp.ndarray,
                     table: ChromTable, min_distance: int,
                     bloom: Optional[DeviceBloomFilter], *, neg_num: int = 3,
                     max_trials: int = 8, hard_ratio: float = 1.0,
                     extra_rounds: int = 32,
                     max_probes: Optional[int] = None,
                     chrom_bounds: Optional[tuple] = None,
                     propose_impl: str = "xla") -> jnp.ndarray:
    """`sample_negatives_with_stats` without the counters."""
    neg, _ = sample_negatives_with_stats(
        key, positives, table, min_distance, bloom, neg_num=neg_num,
        max_trials=max_trials, hard_ratio=hard_ratio,
        extra_rounds=extra_rounds, max_probes=max_probes,
        chrom_bounds=chrom_bounds, propose_impl=propose_impl)
    return neg


def assemble_batch(positives: jnp.ndarray, weights: jnp.ndarray,
                   negatives: jnp.ndarray,
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Concatenate pos+neg into (x, y, w) with reference label/weight rules
    (ref Code/main.py:430-448): y=1/0, positive weight from the quantile
    pipeline, negative weight 1."""
    x = jnp.concatenate([positives, negatives], axis=0)
    y = jnp.concatenate([jnp.ones(positives.shape[0]),
                         jnp.zeros(negatives.shape[0])])[:, None]
    w = jnp.concatenate([weights.reshape(-1),
                         jnp.ones(negatives.shape[0])])[:, None]
    return x, y.astype(jnp.float32), w.astype(jnp.float32)
