"""Shard-major stream layout: communication-free concat/split along a
block-sharded batch axis.

Why this exists.  The merged token-stream loss concatenates per-k bucket
arrays along the batch axis.  Under a data-parallel mesh that axis is
block-sharded, and a plain ``jnp.concatenate`` of pieces whose sizes are not
multiples of the RESULT's per-shard block forces GSPMD to reshard: at the
bench geometry that showed up as ~440 MB/step of all-gather +
collective-permute traffic in the compiled HLO (scripts/comm_budget.py) —
pure overhead, since every downstream per-token stage is row-independent.

The fix is a layout change, not communication: reshape each piece
``(n, ...) -> (ns, n/ns, ...)`` (free: block sharding is contiguous, so the
new leading axis of size ``ns`` is exactly the shard axis), concatenate
along axis 1 (free: axis 1 is unsharded), and flatten back (free).  The
result holds every shard's local rows contiguously — the same global array
a `shard_map`-local concat would produce — and, because block sharding is
contiguous, ``shard_split`` recovers each original piece in its ORIGINAL
row order, also for free.  ``shard_concat`` followed by ``shard_split`` is
an exact inverse for any ``ns``, so single-chip numerics are bit-identical
to the plain path (pinned by tests/test_stream_sharding.py).

Reference counterpart: none — the reference is single-GPU
(Code/main.py:24-35); this is TPU-mesh plumbing for SURVEY §2.15.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def divisible(sizes: Sequence[int], ns: int) -> bool:
    """True if every piece size splits evenly over ns shards (the
    precondition for the shard-major layout; callers fall back to ns=1)."""
    return ns > 1 and all(int(s) % ns == 0 for s in sizes)


def shard_concat(parts: List[jnp.ndarray], ns: int,
                 axis: int = 0) -> jnp.ndarray:
    """Concatenate along a block-sharded axis without resharding.

    Row order of the result is (shard, piece, local-row) rather than
    (piece, shard, local-row); use ``shard_split`` with the same ``ns`` to
    read pieces back in their original order."""
    if ns <= 1 or len(parts) == 1:
        return jnp.concatenate(parts, axis=axis)
    resh = []
    for p in parts:
        n = p.shape[axis]
        assert n % ns == 0, (n, ns)
        resh.append(p.reshape(p.shape[:axis] + (ns, n // ns)
                              + p.shape[axis + 1:]))
    out = jnp.concatenate(resh, axis=axis + 1)
    tot = sum(int(p.shape[axis]) for p in parts)
    return out.reshape(out.shape[:axis] + (tot,) + out.shape[axis + 2:])


def shard_split(arr: jnp.ndarray, ns: int, sizes: Sequence[int],
                axis: int = 0) -> List[jnp.ndarray]:
    """Inverse of ``shard_concat``: recover the original pieces (in their
    original row order) from a shard-major concatenation.  Communication-
    free for the same reason the concat is."""
    if ns <= 1 or len(sizes) == 1:
        out, off = [], 0
        for n in sizes:
            out.append(jax.lax.dynamic_slice_in_dim(arr, off, n, axis))
            off += n
        return out
    tot = arr.shape[axis]
    assert tot % ns == 0, (tot, ns)
    a2 = arr.reshape(arr.shape[:axis] + (ns, tot // ns) + arr.shape[axis + 1:])
    parts, off = [], 0
    for n in sizes:
        assert n % ns == 0, (n, ns)
        piece = jax.lax.dynamic_slice_in_dim(a2, off, n // ns, axis + 1)
        parts.append(piece.reshape(arr.shape[:axis] + (n,)
                                   + arr.shape[axis + 1:]))
        off += n // ns
    return parts
