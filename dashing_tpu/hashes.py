"""64-bit hash functions on uint32 pairs.

The reference sketch library's default hasher is Thomas Wang's 64-bit integer
mixer (`sketch::WangHash`; see reference src/dashing.h:42 `BottomKHasher<
sketch::WangHash,...>` and src/dashing.h:123-128 `SeededHash`).  Wang's hash
is a public-domain bijective mixer built purely from shifts/adds/xors, which
makes it ideal on TPU: no 64-bit multiplies to emulate.

All functions operate elementwise on arbitrary-shaped (hi, lo) uint32 pairs.
"""
from __future__ import annotations

import numpy as np

from . import u64
from .u64 import U64


def wang_hash(x: U64) -> U64:
    """Thomas Wang's 64-bit mix; matches sketch::WangHash::operator()."""
    # key = (~key) + (key << 21)
    x = u64.add(u64.not_(x), u64.shl(x, 21))
    # key = key ^ (key >> 24)
    x = u64.xor(x, u64.shr(x, 24))
    # key = (key + (key << 3)) + (key << 8)   i.e. key * 265
    x = u64.add(u64.add(x, u64.shl(x, 3)), u64.shl(x, 8))
    # key = key ^ (key >> 14)
    x = u64.xor(x, u64.shr(x, 14))
    # key = (key + (key << 2)) + (key << 4)   i.e. key * 21
    x = u64.add(u64.add(x, u64.shl(x, 2)), u64.shl(x, 4))
    # key = key ^ (key >> 28)
    x = u64.xor(x, u64.shr(x, 28))
    # key = key + (key << 31)
    x = u64.add(x, u64.shl(x, 31))
    return x


def seeded_wang_hash(x: U64, seed: int) -> U64:
    """wang_hash(x ^ seed); mirrors SeededHash (reference src/dashing.h:123-128)."""
    return wang_hash(u64.xor(x, u64.const(seed)))


def wang_hash_np(x: np.ndarray) -> np.ndarray:
    """Host-side numpy reference of wang_hash (uint64 in/out)."""
    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = (~x) + (x << np.uint64(21))
        x = x ^ (x >> np.uint64(24))
        x = (x + (x << np.uint64(3))) + (x << np.uint64(8))
        x = x ^ (x >> np.uint64(14))
        x = (x + (x << np.uint64(2))) + (x << np.uint64(4))
        x = x ^ (x >> np.uint64(28))
        x = x + (x << np.uint64(31))
    return x


def seeded_wang_hash_np(x: np.ndarray, seed: int) -> np.ndarray:
    return wang_hash_np(np.asarray(x, np.uint64) ^ np.uint64(seed))


def clz64_np(x: "np.ndarray") -> "np.ndarray":
    """Branchless leading-zero count of nonzero uint64s (log-doubling).

    Shared by the host HLL/WideHLL/HyperMinHash rank computations so the
    rank semantics cannot drift between structures.  Callers guarantee
    nonzero inputs (a guard bit is always planted)."""
    x = np.atleast_1d(np.asarray(x, np.uint64))
    cnt = np.zeros(len(x), np.int64)
    y = np.asarray(x, np.uint64).copy()
    for s in (32, 16, 8, 4, 2, 1):
        zt = (y >> np.uint64(64 - s)) == 0
        cnt += np.where(zt, s, 0)
        y = np.where(zt, y << np.uint64(s), y)
    return cnt


def poisson_min_cardinality(mins: "np.ndarray", m: int) -> float:
    """Invert E[min of uniforms per Poisson(lambda) bucket] = (1-e^-l)/l
    by log-space bisection; cardinality = lambda * m.  `mins` holds the
    FILLED buckets' minima as uint64; empty buckets count as min = 1.
    Shared by the minhash family cardinality estimators."""
    import math
    nfill = len(mins)
    if nfill == 0:
        return 0.0
    u = np.asarray(mins, np.uint64).astype(np.float64) / 2.0 ** 64
    u = np.concatenate([u, np.ones(m - nfill)])
    mean = min(max(float(u.mean()), 1e-18), 1.0 - 1e-12)
    lo, hi = 1e-9, 1e12
    for _ in range(100):
        lam = math.sqrt(lo * hi)
        if -math.expm1(-lam) / lam > mean:
            lo = lam
        else:
            hi = lam
    return math.sqrt(lo * hi) * m
