"""Pallas TPU kernel: VMEM-resident joint-MLE Newton solve.

The XLA formulation keeps the five (pairs, K) statistic histograms in HBM
and the 10-iteration Newton fori_loop re-reads ALL of them every
iteration (~650 MB/iter at the production 1024-tile, K~31) — measured
~70% of the whole -J compare phase (benchmarks/jmle_profile.py: 4.1 ms/
iter of a 58.6 ms tile).  This kernel blocks the pair grid, loads each
block's statistics into VMEM ONCE, and runs the entire Newton trajectory
(init -> iters -> final-likelihood guard -> degenerate masking) without
touching HBM again.

Layout: statistics ride K-FIRST, (K, na, nb) — blocks (K, BA, 128) put
pairs on the (sublane, lane) axes so vregs fill with pairs; K is the
unrolled leading axis (a K-last layout would waste 3/4 of each vreg on a
32-level window).  lt_a/lt_b are DERIVED in-kernel from the marginal
histograms (ha - eq - gt_a), so only three (K, na, nb) arrays ever
materialize in HBM.

The math is the SAME code as the XLA path — estimators.joint_mle_core
with kfirst=True — so the two paths cannot drift.

Reference behavior contract: Ertl's joint MLE (ERTL_JOINT_MLE),
hll_t::full_set_comparison / ertl_joint (reference src/dashing.h:190,
src/readfilt.cpp:118).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_common import BB, VMEM_BUDGET as _VMEM_BUDGET


def _vmem_need(ba: int, K: int) -> int:
    """Working-set estimate: 3 double-buffered f32 in-blocks (K, ba, BB),
    ~30 live (K, ba, BB) f32 temporaries inside the grad/Hessian pass,
    plus scalar-plane blocks and cushion (mirrors pallas_stats sizing).

    30, raised from 22: the complement-chain guard (_joint_logl_chain)
    keeps the three per-level chain stacks plus the log/P stacks live
    simultaneously — at 22 the K=14, ba=64 geometry AOT-compiled to a
    15.52M scoped stack against a 15.25M grantable limit and the
    compile helper 500'd (real-TPU jmle_kernel_check).  Since round 4
    the JMLE kernel ALSO has a fail-closed per-(p, kmin, K) runtime
    probe (pairwise._jmle_kernel_probe) that degrades a crashing
    geometry to the XLA path, but a mispredicted estimate still costs
    that variant the kernel speedup — keep the estimate honest rather
    than leaning on the safety net."""
    blk = K * ba * BB * 4
    return 3 * 2 * blk + 30 * blk + (3 << 20)


def pick_geometry(K: int):
    """Largest BA whose Newton working set fits VMEM; None if none."""
    for ba in (64, 32, 16, 8):
        if _vmem_need(ba, K) <= _VMEM_BUDGET:
            return ba
    return None


def _kernel(eq_ref, gta_ref, gtb_ref, ha_ref, hb_ref, ca_ref, cb_ref,
            cu_ref, la_ref, lb_ref, lx_ref, *, m: float, q: int, kmin: int,
            iters: int):
    from ..sketch.estimators import joint_mle_core
    eq = eq_ref[...]
    gt_a = gta_ref[...]
    gt_b = gtb_ref[...]
    ha = ha_ref[...]                      # (K, BA, 1)
    hb = hb_ref[...]                      # (K, 1, BB)
    stats = dict(eq=eq, gt_a=gt_a, gt_b=gt_b,
                 lt_a=ha - eq - gt_a, lt_b=hb - eq - gt_b)
    cards = (ca_ref[...][:, :1], cb_ref[...][:1, :], cu_ref[...])
    la, lb, lx = joint_mle_core(stats, cards, m, q, kmin, iters,
                                kfirst=True)
    la_ref[...] = la
    lb_ref[...] = lb
    lx_ref[...] = lx


@functools.partial(jax.jit, static_argnames=("p", "kmin", "iters", "ba",
                                             "interpret"))
def pallas_joint_mle(eq, gt_a, gt_b, ha, hb, c_a, c_b, c_u, *, p: int,
                     kmin: int, iters: int = 10, ba: int = 32,
                     interpret: bool = False):
    """K-first statistics -> (3, na, nb) joint-MLE triples.

    eq/gt_a/gt_b: (K, na, nb) f32;  ha: (K, na), hb: (K, nb) marginal
    histograms;  c_a: (na,), c_b: (nb,) marginal cardinalities;
    c_u: (na, nb) union-cardinality init.  na % ba == 0 and nb % 128 == 0
    (the caller pads pairs and trims — padded rows produce garbage
    triples that must be discarded)."""
    K, na, nb = eq.shape
    assert na % ba == 0 and nb % BB == 0, (na, nb, ba)
    m = float(1 << p)
    q = 64 - p
    grid = (na // ba, nb // BB)
    stat_spec = pl.BlockSpec((K, ba, BB), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ba, BB), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    la, lb, lx = pl.pallas_call(
        functools.partial(_kernel, m=m, q=q, kmin=kmin, iters=iters),
        grid=grid,
        in_specs=[stat_spec, stat_spec, stat_spec,
                  # marginals/cards ride with singleton broadcast dims so
                  # every block's last-two dims are (8,128)-divisible or
                  # equal to the full array dims (Mosaic block rule)
                  pl.BlockSpec((K, ba, 1), lambda i, j: (0, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((K, 1, BB), lambda i, j: (0, 0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((ba, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, BB), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((ba, BB), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((na, nb), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(_vmem_need(ba, K), 16 << 20)),
        interpret=interpret,
    )(eq, gt_a, gt_b, ha[:, :, None], hb[:, None, :],
      c_a[:, None], c_b[None, :], c_u)
    return jnp.stack([la, lb, lx])
