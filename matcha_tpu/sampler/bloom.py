"""Device-resident Bloom filter over hyperedges.

Functional replacement for the reference's per-size ``pybloom_live.BloomFilter``
list (ref: Code/utils.py:75-97, built at Code/main.py:664-667): membership
filters for the negative sampler's rejection loop, one per hyperedge size,
sized for ``capacity = 5*len(data)+1000`` at error rate 1e-3.

Here the filter is a uint32 bitset in HBM.  Hashing is a murmur-finalized
FNV-style accumulation over the sorted node ids, computed identically on host
(numpy, for the build) and on device (jnp, for the batched query) — both paths
share `_hash_rows`, written against the array-API-compatible subset of
numpy/jnp.  Double hashing (h1 + i*h2 mod m) generates the per-hash indices, as
in Kirsch & Mitzenmacher.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict

import jax.numpy as jnp
import numpy as np

_FNV_PRIME1 = np.uint32(16777619)
_FNV_PRIME2 = np.uint32(2246822519)
_SEED1 = np.uint32(2166136261)
_SEED2 = np.uint32(0x9747B28C)
_GOLDEN = np.uint32(2654435761)


def _mix(h, xp):
    """murmur3 finalizer (uint32)."""
    h = h ^ (h >> xp.uint32(16))
    h = h * xp.uint32(0x85EBCA6B)
    h = h ^ (h >> xp.uint32(13))
    h = h * xp.uint32(0xC2B2AE35)
    h = h ^ (h >> xp.uint32(16))
    return h


def _hash_rows(rows, xp, axis: int = -1):
    """int rows -> (h1, h2) uint32 hash pair per row, accumulated over the
    k members along ``axis`` (-1: row-major (N, k); -2: feature-major
    (k, N), hashed WITHOUT transposing so the batch axis stays on lanes).

    Identical bit-for-bit under numpy and jnp (uint32 wraparound), and
    independent of ``axis`` for matching data.
    """
    rows = rows.astype(xp.uint32)
    if axis == -1:
        k = rows.shape[-1]
        cols = [rows[..., j] for j in range(k)]
    elif axis == -2:
        k = rows.shape[-2]
        cols = [rows[..., j, :] for j in range(k)]
    else:
        raise ValueError(f"axis must be -1 or -2, got {axis}")
    h1 = xp.full(cols[0].shape, _SEED1, dtype=xp.uint32)
    h2 = xp.full(cols[0].shape, _SEED2, dtype=xp.uint32)
    for x in cols:
        h1 = _mix(h1 ^ x, xp) * _FNV_PRIME1
        h2 = _mix(h2 ^ (x * _GOLDEN), xp) * _FNV_PRIME2
    # guarantee odd step for double hashing so all m residues are reachable
    h2 = h2 | xp.uint32(1)
    return h1, h2


@dataclasses.dataclass
class DeviceBloomFilter:
    """A single-size Bloom filter: uint32 bitset + geometry (jit-static).

    blocked=True is the fast layout: both hash bits of a key live in ONE
    uint32 word (word index from h1, the two bit positions from h2), so a
    membership query is a SINGLE random gather instead of n_hashes — random
    single-word bitset gathers are the negative sampler's HBM bottleneck on
    TPU (profiled at ~0.7 ms per probe pass at bench geometry).  Sized at
    128 bits/item the block collision math gives FP ≈ 7.3e-4 (two bits in
    one ~Poisson(0.5)-loaded 32-bit word), inside the reference's 1e-3 target
    (ref pybloom_live err=1e-3, Code/utils.py:83-85)."""
    bits: jnp.ndarray          # (m_bits // 32,) uint32
    m_bits: int                # static
    n_hashes: int              # static
    blocked: bool = False      # static

    def contains(self, rows: jnp.ndarray) -> jnp.ndarray:
        """Batched membership query: (N, k) int32 -> (N,) bool (device)."""
        return self._contains_hashed(*_hash_rows(rows, jnp))

    def contains_cols(self, rows_t: jnp.ndarray) -> jnp.ndarray:
        """`contains` for feature-major rows: (..., k, N) int32 -> (..., N)
        bool.  Hashing over axis -2 keeps the batch axis N on the TPU lane
        dimension — every elementwise hash op runs full-width instead of
        k/128 lanes (the same layout win as the fm attention kernel)."""
        return self._contains_hashed(*_hash_rows(rows_t, jnp, axis=-2))

    def _contains_hashed(self, h1, h2):
        if self.blocked:
            w, mask = _blocked_word_mask(h1, h2, self.bits.shape[0], jnp)
            word = self.bits[w.astype(jnp.int32)]
            return (word & mask) == mask
        m = jnp.uint32(self.m_bits)
        hit = jnp.ones(h1.shape, dtype=bool)
        for i in range(self.n_hashes):
            idx = (h1 + jnp.uint32(i) * h2) % m
            word = self.bits[(idx >> jnp.uint32(5)).astype(jnp.int32)]
            bit = (word >> (idx & jnp.uint32(31))) & jnp.uint32(1)
            hit = hit & (bit == jnp.uint32(1))
        return hit


def _blocked_word_mask(h1, h2, n_words, xp):
    """(word index, 2-bit mask) for the blocked layout — identical on
    host (numpy) and device (jnp)."""
    w = h1 % xp.uint32(n_words)
    b1 = h2 & xp.uint32(31)
    b2 = (h2 >> xp.uint32(5)) & xp.uint32(31)
    mask = (xp.uint32(1) << b1) | (xp.uint32(1) << b2)
    return w, mask

import jax.tree_util

jax.tree_util.register_pytree_node(
    DeviceBloomFilter,
    lambda f: ((f.bits,), (f.m_bits, f.n_hashes, f.blocked)),
    lambda aux, children: DeviceBloomFilter(children[0], aux[0], aux[1],
                                            aux[2]))


def _geometry(capacity: int, error_rate: float,
              fast: bool = True) -> tuple[int, int, bool]:
    """Filter sizing -> (m_bits, n_hashes, blocked).

    fast=True (default): blocked layout, 128 bits/item (4 words/item) with
    both bits of a key in one word — ONE gather per membership query.
    FP ≈ E[s·(s-1)]/32² + E[s]/32·P(b1=b2) with s ~ Poisson(0.5) set bits
    per word = 0.25/1024 + (0.5/32)/32 ≈ 7.3e-4, within the reference's
    1e-3 target; HBM is cheap and random gathers are not.
    fast=False: classic optimal-k sizing for the requested error rate
    (pybloom_live-equivalent, ref Code/utils.py:83-85).
    """
    if fast and error_rate >= 7.3e-4:
        m_bits = ((capacity * 128 + 31) // 32) * 32
        return m_bits, 2, True
    m_bits = int(math.ceil(-capacity * math.log(error_rate) / (math.log(2) ** 2)))
    m_bits = ((m_bits + 31) // 32) * 32
    if m_bits >= (1 << 32):
        # the classic path's bit indices are uint32 (h % m_bits) — beyond
        # 2^32 bits they would silently wrap to a wrong modulus.  At this
        # capacity the blocked layout (bit indices bounded by the word
        # count, safe to ~10^9 items) is the intended configuration.
        raise ValueError(
            f"bloom geometry overflows uint32 indexing: capacity={capacity} "
            f"error_rate={error_rate} needs {m_bits} bits (>= 2^32); use "
            f"the blocked layout (error_rate >= 7.3e-4)")
    n_hashes = max(1, round(m_bits / capacity * math.log(2)))
    return m_bits, n_hashes, False


def build_bloom(rows: np.ndarray, capacity: int | None = None,
                error_rate: float = 1e-3) -> DeviceBloomFilter:
    """Host-side build from (N, k) sorted hyperedge rows.

    Capacity default matches the reference: 5*N + 1000 (ref Code/utils.py:76-78).
    """
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    n = rows.shape[0]
    if capacity is None:
        capacity = 5 * max(n, 1) + 1000
    m_bits, n_hashes, blocked = _geometry(capacity, error_rate)

    bits = np.zeros(m_bits // 32, dtype=np.uint32)
    if n:
        with np.errstate(over="ignore"):
            h1, h2 = _hash_rows(rows, np)
            if blocked:
                w, mask = _blocked_word_mask(h1, h2, bits.shape[0], np)
                np.bitwise_or.at(bits, w, mask)
            else:
                for i in range(n_hashes):
                    idx = (h1 + np.uint32(i) * h2) % np.uint32(m_bits)
                    np.bitwise_or.at(bits, idx >> np.uint32(5),
                                     np.uint32(1) << (idx & np.uint32(31)))
    return DeviceBloomFilter(bits=jnp.asarray(bits), m_bits=m_bits,
                             n_hashes=n_hashes, blocked=blocked)


def build_bloom_dict(unlabeled: Dict[int, np.ndarray],
                     error_rate: float = 1e-3) -> Dict[int, DeviceBloomFilter]:
    """Per-size filters from the unlabeled k-mer sets (ref Code/main.py:662-667).

    The reference sizes each filter by the TOTAL unlabeled count across sizes
    (`build_hash` gets the concatenated array); we match that capacity rule.
    """
    total = sum(len(v) for v in unlabeled.values())
    capacity = 5 * max(total, 1) + 1000
    return {k: build_bloom(v, capacity=capacity, error_rate=error_rate)
            for k, v in unlabeled.items()}
