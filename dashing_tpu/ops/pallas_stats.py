"""Pallas TPU kernel: fused pairwise register statistics for the joint MLE.

The XLA formulation of pair_stats (ops/pairwise.py) materializes two
indicator matrices per level per side in HBM before each MXU call; at
p=14 / ~25 levels that traffic — not the MACs — dominates the -J compare
phase (measured 4.2 ms of a 6 ms 256x256 tile).  This kernel keeps int8
register blocks resident in VMEM, recomputes indicators on the fly per
level, and runs the three cumulative dots

    X[k] = #(a<=k & b<=k),  Y[k] = #(a<=k & b<=k-1),  Z[k] = #(a<=k-1 & b<=k)

on the MXU in bf16 (0/1 indicators are exact; counts <= 2^p < 2^24 are
exact in f32 accumulation), emitting the same five-statistic family
pairwise.pair_stats derives (eq/gt_a/gt_b by differencing, cum_union = X).

Geometry: grid (na/ba, nb/128, m/slab).  The register axis is a grid
dimension so large p fits VMEM; every statistic is LINEAR in per-slab
partial counts (eq = X - Y - Z + X_prev differences included), so slabs
accumulate into the same revisited output block.  Outputs are
(K, ba, 128)-major so the dynamic level store lands on the leading axis
(dynamic minor-dim stores do not lower well on Mosaic).

Reference behavior contract: these are the sufficient statistics of
Ertl's joint MLE (hll_t::full_set_comparison, reference
src/dashing.h:190, src/readfilt.cpp:118).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_common import BB   # B-side rows per block (output minor dim)
_MS = 2048        # register sub-slab width per MXU dot
# Hard scoped-VMEM ceiling on this target is 16 MiB (a raised
# vmem_limit_bytes crashes the AOT compile helper); leave headroom.
from .pallas_common import VMEM_BUDGET as _VMEM_BUDGET


def _vmem_need(ba: int, slab: int, K: int) -> int:
    """The vmem_limit_bytes this geometry requests (must mirror the
    pallas_call below): double-buffered int8 in-blocks + four (K, ba, BB)
    f32 out-blocks + per-sub-slab int32/bf16 indicator transients + slack
    (measured: Mosaic's stack overhead ran ~0.5 MB past the raw buffer
    arithmetic at K=31, hence the 6 MB total cushion)."""
    return (2 * (ba + BB) * slab + 4 * K * ba * BB * 4
            + (ba + BB) * _MS * 8 + (6 << 20))


def pick_geometry(m: int, K: int):
    """(ba, slab) whose VMEM working set fits, None if none does."""
    if m % _MS != 0:
        return None
    for ba in (128, 64, 32):
        for slab in (16384, 8192, 4096, 2048):
            if slab > m:
                continue
            if _vmem_need(ba, slab, K) <= _VMEM_BUDGET:
                return ba, slab
    return None


def _kernel(a_ref, b_ref, x_ref, eq_ref, gta_ref, gtb_ref, *,
            kmin: int, kmax: int, slab: int, ba: int):
    nsub = slab // _MS
    K = kmax - kmin + 1
    first = pl.program_id(2) == 0

    def level(ki, x_prev):
        k = (kmin + ki).astype(jnp.int32)
        xx = jnp.zeros((ba, BB), jnp.float32)
        yy = jnp.zeros((ba, BB), jnp.float32)
        zz = jnp.zeros((ba, BB), jnp.float32)
        for s in range(nsub):
            sl = slice(s * _MS, (s + 1) * _MS)
            a32 = a_ref[:, sl].astype(jnp.int32)
            b32 = b_ref[:, sl].astype(jnp.int32)
            ca = (a32 <= k).astype(jnp.bfloat16)
            cap = (a32 <= k - 1).astype(jnp.bfloat16)
            cb = (b32 <= k).astype(jnp.bfloat16)
            cbp = (b32 <= k - 1).astype(jnp.bfloat16)
            dn = (((1,), (1,)), ((), ()))
            xx += jax.lax.dot_general(ca, cb, dimension_numbers=dn,
                                      preferred_element_type=jnp.float32)
            yy += jax.lax.dot_general(ca, cbp, dimension_numbers=dn,
                                      preferred_element_type=jnp.float32)
            zz += jax.lax.dot_general(cap, cb, dimension_numbers=dn,
                                      preferred_element_type=jnp.float32)
        # accumulate this register-slab's partial counts; all four stats
        # are linear in (X, Y, Z, X_prev), so per-slab differences sum to
        # the full-register differences
        x_ref[ki] = jnp.where(first, xx, x_ref[ki] + xx)
        eqp = xx - yy - zz + x_prev
        eq_ref[ki] = jnp.where(first, eqp, eq_ref[ki] + eqp)
        gta = yy - x_prev
        gta_ref[ki] = jnp.where(first, gta, gta_ref[ki] + gta)
        gtb = zz - x_prev
        gtb_ref[ki] = jnp.where(first, gtb, gtb_ref[ki] + gtb)
        return xx

    # X_{kmin-1} = 0 for all real registers (>= the global kmin); rows
    # padded with zero registers produce garbage the caller trims.
    jax.lax.fori_loop(0, K, level, jnp.zeros((ba, BB), jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("kmin", "kmax", "ba", "slab",
                                    "interpret"))
def pallas_pair_stats(a: jnp.ndarray, b: jnp.ndarray, *, kmin: int,
                      kmax: int, ba: int = 128, slab: int = 16384,
                      interpret: bool = False):
    """(na, m) x (nb, m) int8 registers -> dict of (na, nb, K) f32 stacks
    {cum_union, eq, gt_a, gt_b}.  na % ba == 0, nb % 128 == 0, and
    m % slab == 0 (the caller pads rows and trims)."""
    na, m = a.shape
    nb = b.shape[0]
    assert na % ba == 0 and nb % BB == 0 and m % slab == 0, (na, nb, m)
    K = kmax - kmin + 1
    grid = (na // ba, nb // BB, m // slab)
    out_shape = [jax.ShapeDtypeStruct((K, na, nb), jnp.float32)] * 4
    out_spec = pl.BlockSpec((K, ba, BB), lambda i, j, s: (0, i, j),
                            memory_space=pltpu.VMEM)
    need = _vmem_need(ba, slab, K)
    x, eq, gta, gtb = pl.pallas_call(
        functools.partial(_kernel, kmin=kmin, kmax=kmax, slab=slab, ba=ba),
        grid=grid,
        in_specs=[pl.BlockSpec((ba, slab), lambda i, j, s: (i, s),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BB, slab), lambda i, j, s: (j, s),
                               memory_space=pltpu.VMEM)],
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(need, 16 << 20)),
        interpret=interpret,
    )(a, b)
    tr = lambda t: jnp.moveaxis(t, 0, -1)
    return {"cum_union": tr(x), "eq": tr(eq), "gt_a": tr(gta),
            "gt_b": tr(gtb)}
