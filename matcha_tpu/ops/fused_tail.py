"""Fused classifier tail: dropout -> pff_n1 -> LayerNorms -> (dyn-static)^2
-> classifier linear, as ONE Pallas kernel pair over the merged token stream.

After the fused attention kernel, the remaining per-token stages of the
Hyper-SAGNN head (ref Code/Modules.py:327-376 PositionwiseFeedForward +
:611-617 encoder tail + the (dynamic-static)^2 classifier, main path
models/hypersagnn.py:forward_buckets) execute as ~15 separate XLA
elementwise/matmul ops, each re-reading and re-writing the (T, 64) token
stream through HBM (~1.5 ms/step at bench scale, xprof).  This kernel reads
the attention output ``y`` and the static stream ``h`` once, keeps every
intermediate in VMEM, and writes only the (T,) per-position logits.

Dropout masks are generated IN-KERNEL with the per-core PRNG
(``pltpu.prng_seed(seed + block)``): the backward kernel re-seeds
identically and regenerates the exact same masks, so no (T, 64) mask ever
touches HBM and the recompute is bit-consistent with the forward.  The
realized Bernoulli noise differs from the jax.random stream of the XLA path
(distribution-identical inverted dropout, torch semantics); eval mode is
numerically equivalent to the XLA path.

The gradient boundary is a custom_vjp; weight/LN gradients accumulate in
f32 across grid blocks in revisited output buffers (constant index_map,
zero-init at block 0 — the same pattern as ops/hyperedge_attention.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BT = 512           # tokens per block (bf16 sublane multiple)
_EPS = 1e-5


def _ln_fwd(x, g, b):
    """LayerNorm over the feature (lane) axis; returns (out_dt, xhat, inv)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _EPS)
    xhat = (x32 - mu) * inv
    return (xhat * g + b).astype(x.dtype), xhat, inv


def _ln_bwd(g_out, xhat, inv, g):
    """Given upstream grad (f32), xhat, inv and the scale param: returns
    (g_x f32, g_scale, g_bias)."""
    gg = jnp.sum(g_out * xhat, axis=0)
    gb = jnp.sum(g_out, axis=0)
    gx = g_out * g
    g_x = inv * (gx - jnp.mean(gx, axis=-1, keepdims=True)
                 - xhat * jnp.mean(gx * xhat, axis=-1, keepdims=True))
    return g_x, gg, gb


def bits_to_mask(bits_u32, rate: float):
    """uint32 random bits -> inverted-dropout keep mask scaled by
    1/(1-rate) (top 24 bits -> uniform [0, 1); keep iff u >= rate).
    Pure jnp so the transform is CPU-testable outside the kernel."""
    # route the u32->f32 cast through int32 (the >>8 top-24-bit value is
    # always < 2^24 so the signed reinterpretation is lossless): Mosaic
    # has no uint32->float32 lowering on real hardware
    u = (jax.lax.shift_right_logical(bits_u32, jnp.uint32(8))
         .astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24)))
    return jnp.where(u >= rate, 1.0 / (1.0 - rate), 0.0)


def _mask(shape, rate: float):
    """In-kernel dropout mask (consumes one prng_random_bits call; call
    order must match between forward and backward)."""
    # prng_random_bits returns int32 in this JAX version; bitcast to
    # uint32 before the logical shift
    return bits_to_mask(pltpu.bitcast(pltpu.prng_random_bits(shape),
                                      jnp.uint32), rate)


def _stage_fwd(y, h, ln_ref, w1_ref, b1_ref, w2_ref, b2_ref, wc_ref,
               bc_ref, *, r0: float, r1: float, train: bool,
               need_pp: bool = True):
    """The fused chain on one (bt, d) block; returns every intermediate the
    backward needs (all recomputed there — this helper is shared)."""
    dt = y.dtype
    f32 = jnp.float32
    ln = ln_ref[...]                                       # (6, d) f32
    if train and r0 > 0.0:
        m0 = _mask(y.shape, r0)
        d0 = (y.astype(f32) * m0).astype(dt)
    else:
        m0 = None
        d0 = y
    a1 = (jax.lax.dot_general(d0, w1_ref[...].astype(dt),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)
          + b1_ref[...].astype(f32))
    h1 = jnp.tanh(a1)                                      # (bt, d) f32
    if train and r1 > 0.0:
        m1 = _mask(h1.shape, r1)
        hd = (h1 * m1).astype(dt)
    else:
        m1 = None
        hd = h1.astype(dt)
    o = (jax.lax.dot_general(hd, w2_ref[...].astype(dt),
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=f32)
         + b2_ref[...].astype(f32) + d0.astype(f32)).astype(dt)
    dyn, xo, inv_o = _ln_fwd(o, ln[0], ln[1])              # pff_n1 ln
    dynamic, xd, inv_d = _ln_fwd(dyn, ln[2], ln[3])        # ln_dynamic
    static, xs, inv_s = _ln_fwd(h, ln[4], ln[5])           # ln_static
    diff = dynamic.astype(f32) - static.astype(f32)
    out = (diff * diff).astype(dt)
    if need_pp:
        # N=1 classifier dot as a VPU broadcast+reduce in f32: Mosaic
        # lowers an f32 MXU dot as ONE bf16 pass (XLA lowers N=1 dots as
        # f32 reduces), which cost ~1% logit error on real hardware —
        # wc arrives as a (1, d) row so this stays a lane-wise broadcast
        pp = (jnp.sum(diff * diff * wc_ref[...].astype(f32),
                      axis=1, keepdims=True)
              + bc_ref[...].astype(f32))                    # (bt, 1) f32
    else:
        pp = None                       # backward recompute stops at `out`
    return (pp, d0, m0, h1, m1, hd, xo, inv_o, xd, inv_d, xs, inv_s,
            diff, out)


def _fwd_kernel(seed_ref, y_ref, h_ref, ln_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, wc_ref, bc_ref, pp_ref, *, r0, r1, train):
    if train and (r0 > 0.0 or r1 > 0.0):
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    res = _stage_fwd(y_ref[...], h_ref[...], ln_ref, w1_ref, b1_ref,
                     w2_ref, b2_ref, wc_ref, bc_ref,
                     r0=r0, r1=r1, train=train)
    pp_ref[...] = res[0]


def _bwd_kernel(seed_ref, y_ref, h_ref, ln_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, wc_ref, bc_ref, g_ref,
                gy_ref, gh_ref, gln_ref, gw1_ref, gb1_ref, gw2_ref,
                gb2_ref, gwc_ref, gbc_ref, *, r0, r1, train):
    f32 = jnp.float32
    if train and (r0 > 0.0 or r1 > 0.0):
        # identical seed + call order -> identical masks as the forward
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    (_, d0, m0, h1, m1, hd, xo, inv_o, xd, inv_d, xs, inv_s,
     diff, out) = _stage_fwd(y_ref[...], h_ref[...], ln_ref, w1_ref, b1_ref,
                             w2_ref, b2_ref, wc_ref, bc_ref,
                             r0=r0, r1=r1, train=train, need_pp=False)
    ln = ln_ref[...]
    g = g_ref[...]                                         # (bt, 1) f32

    # classifier linear as exact f32 VPU broadcasts (wc arrives (1, d);
    # the K=1/N=1 MXU dots would round operands to bf16 — see _stage_fwd)
    g_out = g * wc_ref[...].astype(f32)                     # (bt, d)
    gwc = jnp.sum(out.astype(f32) * g, axis=0,
                  keepdims=True)                            # (1, d)
    gbc = jnp.sum(g, axis=0)                                # (1,)

    g_diff = 2.0 * diff * g_out
    g_dyn, g_gd, g_bd = _ln_bwd(g_diff, xd, inv_d, ln[2])
    g_h, g_gs, g_bs = _ln_bwd(-g_diff, xs, inv_s, ln[4])
    g_o, g_gp, g_bp = _ln_bwd(g_dyn, xo, inv_o, ln[0])

    dt = y_ref.dtype
    g_o_dt = g_o.astype(dt)
    g_hd = jax.lax.dot_general(g_o_dt, w2_ref[...].astype(dt),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=f32)  # (bt, d)
    gw2 = jax.lax.dot_general(hd, g_o_dt,
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)   # (d, d)
    gb2 = jnp.sum(g_o, axis=0)
    g_h1 = g_hd * m1 if (train and r1 > 0.0) else g_hd
    g_a1 = g_h1 * (1.0 - h1 * h1)
    g_a1_dt = g_a1.astype(dt)
    g_d0 = (jax.lax.dot_general(g_a1_dt, w1_ref[...].astype(dt),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)
            + g_o)                                          # residual
    gw1 = jax.lax.dot_general(d0, g_a1_dt,
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    gb1 = jnp.sum(g_a1, axis=0)
    g_y = g_d0 * m0 if (train and r0 > 0.0) else g_d0

    gy_ref[...] = g_y.astype(gy_ref.dtype)
    gh_ref[...] = g_h.astype(gh_ref.dtype)

    gln_blk = jnp.stack([g_gp, g_bp, g_gd, g_bd, g_gs, g_bs])  # (6, d)

    @pl.when(pl.program_id(0) == 0)
    def _():
        gln_ref[...] = jnp.zeros_like(gln_ref)
        gw1_ref[...] = jnp.zeros_like(gw1_ref)
        gb1_ref[...] = jnp.zeros_like(gb1_ref)
        gw2_ref[...] = jnp.zeros_like(gw2_ref)
        gb2_ref[...] = jnp.zeros_like(gb2_ref)
        gwc_ref[...] = jnp.zeros_like(gwc_ref)
        gbc_ref[...] = jnp.zeros_like(gbc_ref)

    gln_ref[...] += gln_blk
    gw1_ref[...] += gw1
    gb1_ref[...] += gb1
    gw2_ref[...] += gw2
    gb2_ref[...] += gb2
    gwc_ref[...] += gwc
    gbc_ref[...] += gbc


def pack_ln6(ln_pff, ln_dyn, ln_st):
    """The (6, d) LN parameter stack in the row order the kernels index
    (pff_n1 ln g/b, ln_dynamic g/b, ln_static g/b) — the ONLY place that
    order is defined; all callers must use this."""
    return jnp.stack([ln_pff["g"], ln_pff["b"], ln_dyn["g"], ln_dyn["b"],
                      ln_st["g"], ln_st["b"]]).astype(jnp.float32)


def _common_in_specs(bt, d):
    toks = pl.BlockSpec((bt, d), lambda i: (i, 0))
    rep = lambda s: pl.BlockSpec(s, (lambda i: (0,) * len(s)))
    return [pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),   # seed (2D scalar)
            toks, toks, rep((6, d)), rep((d, d)), rep((d,)),
            rep((d, d)), rep((d,)), rep((1, d)), rep((1,))], toks, rep


@partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def fused_tail(y, h, ln6, w1, b1, w2, b2, wc, bc, seed,
               r0: float, r1: float, train: bool):
    """(T, 1) f32 per-position classifier logits from the attention
    output ``y`` (pre-dropout) and the static stream ``h``."""
    pp, _ = _ft_fwd(y, h, ln6, w1, b1, w2, b2, wc, bc, seed,
                    r0, r1, train)
    return pp


def _ft_fwd(y, h, ln6, w1, b1, w2, b2, wc, bc, seed, r0, r1, train):
    T, d = y.shape
    assert T % BT == 0, f"T={T} not divisible by {BT}"
    f32 = jnp.float32
    interpret = jax.default_backend() == "cpu"
    in_specs, toks, _ = _common_in_specs(BT, d)
    pp = pl.pallas_call(
        partial(_fwd_kernel, r0=r0, r1=r1, train=train),
        grid=(T // BT,), in_specs=in_specs,
        out_specs=pl.BlockSpec((BT, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((T, 1), f32),
        interpret=interpret)(
        jnp.asarray(seed, jnp.int32).reshape(1, 1), y, h, ln6,
        w1.astype(y.dtype), b1.astype(f32), w2.astype(y.dtype),
        b2.astype(f32), wc.astype(f32).reshape(1, d), bc.astype(f32))
    return pp, (y, h, ln6, w1, b1, w2, b2, wc, bc, seed)


def _ft_bwd(r0, r1, train, res, g):
    y, h, ln6, w1, b1, w2, b2, wc, bc, seed = res
    T, d = y.shape
    f32 = jnp.float32
    interpret = jax.default_backend() == "cpu"
    in_specs, toks, rep = _common_in_specs(BT, d)
    in_specs.append(pl.BlockSpec((BT, 1), lambda i: (i, 0)))
    out_specs = [toks, toks, rep((6, d)), rep((d, d)), rep((d,)),
                 rep((d, d)), rep((d,)), rep((1, d)), rep((1,))]
    out_shape = [jax.ShapeDtypeStruct((T, d), y.dtype),
                 jax.ShapeDtypeStruct((T, d), h.dtype),
                 jax.ShapeDtypeStruct((6, d), f32),
                 jax.ShapeDtypeStruct((d, d), f32),
                 jax.ShapeDtypeStruct((d,), f32),
                 jax.ShapeDtypeStruct((d, d), f32),
                 jax.ShapeDtypeStruct((d,), f32),
                 jax.ShapeDtypeStruct((1, d), f32),
                 jax.ShapeDtypeStruct((1,), f32)]
    gy, gh, gln, gw1, gb1, gw2, gb2, gwc, gbc = pl.pallas_call(
        partial(_bwd_kernel, r0=r0, r1=r1, train=train),
        grid=(T // BT,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret)(
        jnp.asarray(seed, jnp.int32).reshape(1, 1), y, h, ln6,
        w1.astype(y.dtype), b1.astype(f32), w2.astype(y.dtype),
        b2.astype(f32), wc.astype(f32).reshape(1, d), bc.astype(f32),
        g.astype(f32))
    # seed is an int input: its cotangent is the symbolic float0 zero
    g_seed = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    return (gy, gh, gln, gw1.astype(w1.dtype), gb1.astype(b1.dtype),
            gw2.astype(w2.dtype), gb2.astype(b2.dtype),
            gwc.reshape(d, 1).astype(wc.dtype),
            gbc.astype(bc.dtype), g_seed)


fused_tail.defvjp(_ft_fwd, _ft_bwd)


def fused_tail_sharded(y, h, ln6, w1, b1, w2, b2, wc, bc, seed, r0, r1,
                       train, mesh):
    """fused_tail shard_mapped over the mesh "data" axis (Pallas custom
    calls have no GSPMD rule — see parallel/mesh.py).  Params enter with
    P() (replicated) in_specs, so the shard_map transpose psums their
    per-shard gradient partials; each shard offsets the PRNG seed by its
    data index so dropout masks differ across shards."""
    from matcha_tpu.parallel.mesh import data_shard_map

    def call(yy, hh, *rest):
        *ws, sd = rest
        shard = jax.lax.axis_index("data").astype(jnp.int32)
        return fused_tail(yy, hh, *ws, sd + shard * jnp.int32(1 << 20),
                          r0, r1, train)

    # check_vma=False: the kernel body creates internal constants (LN
    # divisors etc.) whose empty vma set trips the checker; with the check
    # off, the shard_map transpose still psums the cotangents of the
    # P()-replicated weight inputs (pinned by the sharded-grads test)
    return data_shard_map(call, mesh, 2, 8, check_vma=False)(
        y, h, ln6, w1, b1, w2, b2, wc, bc, seed)
