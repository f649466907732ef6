"""Pallas TPU kernel: VMEM-resident windowed union-cardinality estimate.

The non-joint compare path (every measure except -J) derives each pair's
triple from three cardinalities; c_a/c_b depend only on tile MARGINALS
(n-cost, computed outside), but c_u runs a windowed estimator over the
(na, nb, K) pairwise union histogram — with ERTL_MLE (the default) that
is a 12-iteration Newton loop whose operand histograms re-read from HBM
every iteration, plus a materialized (na, nb, K) histogram differencing
of the cumulative-count stack.  This kernel blocks the pair grid, loads
each block's cumulative stack into VMEM ONCE, differences it in-VMEM,
runs the estimator (improved init + Newton for MLE; single pass for
ORIGINAL/IMPROVED), and emits the (onlyA, onlyB, shared) triples
directly — zero HBM traffic between iterations and no (na, nb, K)
intermediates in HBM at all.

The math is the SAME code as the XLA path — estimators.estimate_windowed
internals with kfirst=True — so the two paths cannot drift.

Reference behavior contract: result_cmp's cardinality-based measures
(reference src/dashing.h:568-592) with the Ertl estimator family.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sketch import estimators as est

from .pallas_common import BB, VMEM_BUDGET as _VMEM_BUDGET


def _vmem_need(ba: int, K: int) -> int:
    """Working set: 1 double-buffered f32 in-block (K, ba, BB), the
    differenced histogram, ~9 live (K, ba, BB) temporaries inside the
    Newton derivative pass (raised from 6 for the complement-chain
    stacks of _mle_dlogl12_chain, mirroring the measured jmle kernel
    underestimate), plus scalar planes and cushion."""
    blk = K * ba * BB * 4
    return 2 * blk + blk + 9 * blk + (2 << 20)


def pick_geometry(K: int):
    """Largest BA whose working set fits VMEM; None if none."""
    for ba in (64, 32, 16, 8):
        if _vmem_need(ba, K) <= _VMEM_BUDGET:
            return ba
    return None


def _estimate_kfirst(hist, p: int, kmin: int, method: int):
    if method == est.ORIGINAL:
        return est.original_estimate_windowed(hist, p, kmin, kfirst=True)
    if method == est.ERTL_IMPROVED:
        return est.improved_estimate_windowed(hist, p, kmin, kfirst=True)
    return est.mle_estimate_windowed(hist, p, kmin, kfirst=True)


def _kernel(cum_ref, ca_ref, cb_ref, oa_ref, ob_ref, sh_ref, *, p: int,
            kmin: int, method: int):
    cum = cum_ref[...]                    # (K, BA, BB) cumulative counts
    hist = jnp.concatenate([cum[:1], cum[1:] - cum[:-1]], axis=0)
    c_u = _estimate_kfirst(hist, p, kmin, method)
    c_a = ca_ref[...][:, :1]              # (BA, 1)
    c_b = cb_ref[...][:1, :]              # (1, BB)
    shared = jnp.maximum(0.0, c_a + c_b - c_u)
    oa_ref[...] = jnp.maximum(c_a - shared, 0.0)
    ob_ref[...] = jnp.maximum(c_b - shared, 0.0)
    sh_ref[...] = shared


@functools.partial(jax.jit, static_argnames=("p", "kmin", "method", "ba",
                                             "interpret"))
def pallas_union_triples(cum, c_a, c_b, *, p: int, kmin: int, method: int,
                         ba: int = 32, interpret: bool = False):
    """K-first cumulative union counts -> (3, na, nb) set triples.

    cum: (K, na, nb) f32 cumulative counts (#(max(a_i,b_j) <= level));
    c_a: (na,), c_b: (nb,) marginal cardinalities.  na % ba == 0 and
    nb % 128 == 0 (callers pad and trim; padded entries produce garbage
    triples that must be discarded)."""
    K, na, nb = cum.shape
    assert na % ba == 0 and nb % BB == 0, (na, nb, ba)
    grid = (na // ba, nb // BB)
    oa, ob, sh = pl.pallas_call(
        functools.partial(_kernel, p=p, kmin=kmin, method=method),
        grid=grid,
        in_specs=[pl.BlockSpec((K, ba, BB), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((ba, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, BB), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((ba, BB), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((na, nb), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(_vmem_need(ba, K), 16 << 20)),
        interpret=interpret,
    )(cum, c_a[:, None], c_b[None, :])
    return jnp.stack([oa, ob, sh])
