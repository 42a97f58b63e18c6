"""Fused phase-1 negative-proposal kernel (feature-major Pallas).

The sampler's phase 1 (sampler/negative.py:sample_negatives_with_stats)
proposes T candidate rounds per row: resample the corrupted positions
uniformly in their chromosome range, sort each candidate with a k-wide
sorting network, check the min-distance gaps, and select the first S
structurally-valid candidates per row for Bloom probing.  As XLA ops this
work runs on (T, n, k) tensors with k <= 5 on the TPU lane axis — at most
5 of 128 lanes do work, and every stage round-trips the (T, n, k)
intermediates through HBM (~1.0 ms/step at bench geometry).

This kernel runs the whole chain in one VMEM pass over FEATURE-MAJOR
blocks: members on the sublane axis (k rows), batch rows on the lane axis
— every compare/select/min/max is full-width, the same layout win as the
feature-major attention kernel (ops/hyperedge_attention.py).

Determinism contract: the uniforms ``u`` are an INPUT (drawn with
jax.random outside), so the kernel is a pure function — bit-identical to
the jnp mirror ``propose_phase1_ref`` (pinned in interpret mode by
tests/test_propose.py), which doubles as the documentation of the math.
Reference semantics: the propose-until-clean loop of ref
Code/main.py:389-421 with first-acceptance order preserved.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from matcha_tpu.sampler.negative import _SORT_NETS

# block width over the row axis n; n must divide by a supported width
_BLOCK_WIDTHS = (2048, 512, 128)


def supported_block(n: int) -> int:
    """Largest supported lane-block width dividing n (0 = unsupported)."""
    for bn in _BLOCK_WIDTHS:
        if n % bn == 0:
            return bn
    return 0


def _phase1_body(orig, change, lo, hi, u, *, min_distance, T, S, k):
    """The fused chain on one feature-major block; pure jnp so it runs
    unchanged inside the kernel and as the mirror.

    orig/change: (k, bn) i32; lo/hi: (k, bn) f32; u: (T, k, bn) f32.
    Returns (probe: S-list of (k, bn) i32, has: S-list of (1, bn) bool).
    """
    width = hi - lo
    one = orig[:1, :]
    rank = jnp.zeros(one.shape, jnp.int32)
    probe = [jnp.zeros(orig.shape, jnp.int32) for _ in range(S)]
    has = [jnp.zeros(one.shape, jnp.bool_) for _ in range(S)]
    net = _SORT_NETS[k]
    for t in range(T):
        # f32-rounding guard: never land on hi itself (sampler propose())
        cand = (lo + jnp.minimum(jnp.floor(width * u[t]),
                                 width - 1.0)).astype(jnp.int32)
        temp = jnp.where(change != 0, cand, orig)
        cols = [temp[c:c + 1, :] for c in range(k)]
        for i, j in net:
            lo_c = jnp.minimum(cols[i], cols[j])
            hi_c = jnp.maximum(cols[i], cols[j])
            cols[i], cols[j] = lo_c, hi_c
        ok = jnp.ones(one.shape, jnp.bool_)
        for c in range(k - 1):
            ok = ok & (cols[c + 1] - cols[c] > min_distance)
        sorted_t = jnp.concatenate(cols, axis=0)            # (k, bn)
        for s in range(S):
            m = ok & (rank == s)                            # (1, bn)
            probe[s] = probe[s] + jnp.where(m, sorted_t, 0)
            has[s] = has[s] | m
        rank = rank + ok.astype(jnp.int32)
    return probe, has


def _kernel(orig_ref, change_ref, lo_ref, hi_ref, u_ref, probe_ref, has_ref,
            *, min_distance, T, S, k):
    probe, has = _phase1_body(orig_ref[...], change_ref[...], lo_ref[...],
                              hi_ref[...], u_ref[...],
                              min_distance=min_distance, T=T, S=S, k=k)
    probe_ref[...] = jnp.stack(probe)                       # (S, k, bn)
    # cast each mask BEFORE concatenating: Mosaic cannot concat i1 vregs
    # (lowers to an invalid i1->i32 tpu.bitcast_vreg on real hardware)
    has_ref[...] = jnp.concatenate([h.astype(jnp.int32) for h in has],
                                   axis=0)                  # (S, bn)


def propose_phase1(orig_t: jnp.ndarray, change_t: jnp.ndarray,
                   lo_t: jnp.ndarray, hi_t: jnp.ndarray, u: jnp.ndarray,
                   *, min_distance: int, max_probes: int,
                   interpret: bool | None = None):
    """Feature-major phase-1 proposals.

    orig_t/change_t: (k, n) int32; lo_t/hi_t: (k, n) float32;
    u: (T, k, n) float32 uniforms.  Returns (probe (S, k, n) int32 with
    S = min(max_probes, T), stage_has (S, n) bool): the s-th
    structurally-valid candidate per row (zero rows where none exists) and
    whether it exists.
    """
    k, n = orig_t.shape
    T = u.shape[0]
    S = max(1, min(int(max_probes), T))
    bn = supported_block(n)
    if bn == 0:
        raise ValueError(f"n={n} not divisible by any of {_BLOCK_WIDTHS}")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    body = partial(_kernel, min_distance=int(min_distance), T=T, S=S, k=k)
    kn = lambda i: (0, i)
    probe, has = pl.pallas_call(
        body,
        grid=(n // bn,),
        in_specs=[pl.BlockSpec((k, bn), kn), pl.BlockSpec((k, bn), kn),
                  pl.BlockSpec((k, bn), kn), pl.BlockSpec((k, bn), kn),
                  pl.BlockSpec((T, k, bn), lambda i: (0, 0, i))],
        out_specs=[pl.BlockSpec((S, k, bn), lambda i: (0, 0, i)),
                   pl.BlockSpec((S, bn), kn)],
        out_shape=[jax.ShapeDtypeStruct((S, k, n), jnp.int32),
                   jax.ShapeDtypeStruct((S, n), jnp.int32)],
        interpret=interpret,
    )(orig_t.astype(jnp.int32), change_t.astype(jnp.int32),
      lo_t.astype(jnp.float32), hi_t.astype(jnp.float32),
      u.astype(jnp.float32))
    return probe, has != 0


def propose_phase1_ref(orig_t, change_t, lo_t, hi_t, u, *, min_distance,
                       max_probes):
    """Pure-jnp mirror of `propose_phase1` (identical math and layouts):
    the interpret-mode oracle and a CPU-runnable fallback."""
    k, n = orig_t.shape
    T = u.shape[0]
    S = max(1, min(int(max_probes), T))
    probe, has = _phase1_body(
        orig_t.astype(jnp.int32), change_t.astype(jnp.int32),
        lo_t.astype(jnp.float32), hi_t.astype(jnp.float32),
        u.astype(jnp.float32), min_distance=int(min_distance), T=T, S=S, k=k)
    return jnp.stack(probe), jnp.concatenate(has, axis=0)
