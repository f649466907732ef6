"""Weighted (multiset) Jaccard support — wj::WeightedSketcher equivalent.

The reference wraps any sketch in wj::WeightedSketcher<T[, ExactCounting
Adapter]> (reference src/dashing.h:418-443, dispatch src/distmain.cpp:159-173)
implementing Broder's labeled w-shingling: the i-th occurrence of a k-mer is
a distinct element (k-mer, i), so plain set Jaccard over the expanded
elements estimates the multiset Jaccard  sum min(a,b) / sum max(a,b).

Counting is exact (--wj-exact; reference wj::ExactCountingAdapter) or via a
count-min sketch (--wj; reference ccm_t(16, cmsize, nhashes)).  Batched
two-pass counting replaces the reference's streaming `c = cm.addh(x)`:
membership of (k-mer, i) depends only on the final count, so the expanded
element set is identical for exact counts and differs for CM only through
CM's overestimation.
"""
from __future__ import annotations

import numpy as np

from ..hashes import wang_hash_np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def occurrence_expand(kmers: np.ndarray, counts_cap: int = 0) -> np.ndarray:
    """Raw k-mer stream (with multiplicity) -> labeled elements.

    Element for the i-th occurrence (i >= 1) of value v:
        wang_hash(v ^ (i * GOLDEN))
    which is engine-internal but deterministic, the same role as the
    reference's internal (hash, count) combiner.
    """
    kmers = np.asarray(kmers, np.uint64)
    if kmers.size == 0:
        return kmers
    uniq, counts = np.unique(kmers, return_counts=True)
    if counts_cap:
        counts = np.minimum(counts, counts_cap)
    return expand_unique_counts(uniq, counts)


def expand_unique_counts(uniq: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """(unique values, multiplicities) -> labeled elements (see
    occurrence_expand); callers that already hold counts skip a full
    sort+unique of the expanded stream."""
    if uniq.size == 0:
        return np.asarray(uniq, np.uint64)
    reps = np.repeat(np.asarray(uniq, np.uint64), counts)
    offs = np.arange(int(counts.sum()), dtype=np.uint64)
    starts = np.repeat(np.cumsum(counts) - counts, counts).astype(np.uint64)
    occ = offs - starts + np.uint64(1)
    with np.errstate(over="ignore"):
        return wang_hash_np(reps ^ (occ * _GOLDEN))


def cm_estimated_counts(kmers: np.ndarray, cmsize_log2: int = 22,
                        nhashes: int = 10, seed: int = 1337
                        ) -> "tuple[np.ndarray, np.ndarray]":
    """Count-min multiplicity estimates per unique k-mer (host numpy).

    Defaults mirror GlobalArgs: wj cm size 22, 10 hashes (reference
    src/dashing.h:252-253)."""
    kmers = np.asarray(kmers, np.uint64)
    uniq, counts = np.unique(kmers, return_counts=True)
    m = 1 << cmsize_log2
    est = None
    for row in range(nhashes):
        h = wang_hash_np(uniq ^ np.uint64((seed + row * 0x9E3779B9) | 1))
        idx = (h >> np.uint64(64 - cmsize_log2)).astype(np.int64)
        # bincount is several-fold faster than np.add.at's buffered
        # ufunc loop for this scatter-add (identical integer results)
        table = np.bincount(idx, weights=counts, minlength=m
                            ).astype(np.int64)
        v = table[idx]
        est = v if est is None else np.minimum(est, v)
    return uniq, est


def weighted_elements(kmers: np.ndarray, exact: bool, cmsize_log2: int = 22,
                      nhashes: int = 10, seed: int = 1337) -> np.ndarray:
    """Full weighted expansion of a k-mer stream."""
    if exact:
        return occurrence_expand(kmers)
    uniq, est = cm_estimated_counts(kmers, cmsize_log2, nhashes, seed)
    return expand_unique_counts(uniq, est)


# ---------------------------------------------------------------------------
# Device-native occurrence labeling: the whole weighted expansion on the
# chip.  The host path above pulls every k-mer to the host (640 MB for a
# 1M-read FASTQ) and sorts there; this one sorts the device-resident
# stream, derives per-value occurrence indices from run positions (exact
# counts, order-free), and labels in place — nothing crosses the link.
# ---------------------------------------------------------------------------

def occurrence_labels_device(h, valid):
    """Device u64 k-mer stream -> (labeled elements u64, sorted validity).

    h: U64 pair of any shape; valid: matching bool.  Invalid lanes sort to
    the end (forced to the max key) and stay masked in the output.
    Element for the i-th occurrence of value v: wang_hash(v ^ i*GOLDEN) —
    identical to the host occurrence_expand labeling.
    """
    import jax
    import jax.numpy as jnp
    from .. import u64
    from ..hashes import wang_hash
    hi = h[0].reshape(-1)
    lo = h[1].reshape(-1)
    v = valid.reshape(-1)
    # validity participates in the sort key (invalid last) so invalid lanes
    # can NEVER merge into a valid run — not even for a legitimate k-mer
    # whose value is all-ones (k=32 poly-T without canonicalization)
    inv = (~v).astype(jnp.int32)
    sinv, shi, slo = jax.lax.sort((inv, hi, lo), num_keys=3)
    sv = sinv == 0
    n = shi.shape[0]
    prev_hi = jnp.concatenate([~shi[:1], shi[:-1]])
    prev_lo = jnp.concatenate([~slo[:1], slo[:-1]])
    prev_inv = jnp.concatenate([1 - sinv[:1], sinv[:-1]])
    boundary = (shi != prev_hi) | (slo != prev_lo) | (sinv != prev_inv)
    iota = jnp.arange(n, dtype=jnp.int32)
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(boundary, iota, -1))
    occ = (iota - run_start + 1).astype(jnp.uint32)
    label = u64.mul_const((jnp.zeros_like(occ), occ), int(_GOLDEN))
    return wang_hash(u64.xor((shi, slo), label)), sv
