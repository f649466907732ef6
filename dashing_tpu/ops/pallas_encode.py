"""Pallas TPU kernel: fused encode -> hash -> (bucket, rank) keys.

One VMEM-resident pass replaces the XLA elementwise chain (which round-trips
intermediates through HBM between fusions): ASCII bases are 2-bit coded,
packed into canonical k-mers by log-doubling, Wang-hashed, and reduced to a
packed int32 key (bucket << 6 | rank) per position — the exact input the
top_k-compacted register update consumes.  Invalid windows get rank 0
(a no-op under max), so no separate mask output is needed.

The grid runs over row blocks of the pipeline's halo-overlapped tiles (the
rows already carry the (k-1) halo, so no in-kernel halo DMA is needed).
Everything inside is plain jnp on values, so the same body runs under
interpret mode in tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import u64
from ..hashes import wang_hash
from .encode import base_codes, _shift_or_kmers_contiguous

BLOCK_R = 8


def _keys_from_code_valid(code, valid, *, k: int, p: int, canon: bool):
    """Shared kernel tail: (code, valid) -> packed (idx << 6 | rank) keys.
    Both the ASCII and the packed-input kernels MUST stay bitwise
    identical, so the math lives in exactly one place."""
    fwd, rc, wvalid = _shift_or_kmers_contiguous(code, valid, k)
    km = u64.min_(fwd, rc) if canon else fwd
    h = wang_hash(km)
    idx = (h[0] >> (32 - p)).astype(jnp.int32)
    rest = u64.or_(u64.shl(h, p), u64.const(1 << (p - 1)))
    rank = (u64.clz(rest) + 1).astype(jnp.int32)
    rank = jnp.where(wvalid, rank, 0)
    return (idx << 6) | rank


def _kernel(tile_ref, out_ref, *, k: int, p: int, canon: bool):
    # int32 throughout: Mosaic has no int8 vector compares on this target
    tile = tile_ref[...].astype(jnp.int32)
    code, valid = base_codes(tile)
    out_ref[...] = _keys_from_code_valid(code, valid, k=k, p=p, canon=canon)


@functools.partial(jax.jit, static_argnames=("k", "p", "canon", "interpret",
                                             "block_r"))
def encode_hash_keys(tile: jnp.ndarray, *, k: int, p: int, canon: bool = True,
                     interpret: bool = False,
                     block_r: int = BLOCK_R) -> jnp.ndarray:
    """(R, C) uint8 ASCII -> (R, C - k + 1) int32 packed keys.

    R must be a multiple of block_r (the pipeline pads rows to powers of
    two >= 8).  Rows are processed whole; VMEM holds one block_r-row slab.
    """
    R, C = tile.shape
    W = C - k + 1
    assert R % block_r == 0, R
    grid = (R // block_r,)
    return pl.pallas_call(
        functools.partial(_kernel, k=k, p=p, canon=canon),
        grid=grid,
        in_specs=[pl.BlockSpec((block_r, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_r, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.int32),
        interpret=interpret,
    )(tile)


def keys_to_update_inputs(keys: jnp.ndarray):
    """Packed keys -> (bucket idx, rank) int32 pair."""
    return keys >> 6, keys & 63


# ---------------------------------------------------------------------------
# Packed-input variant: the host ships 2-bit codes (4 bases/byte) plus an
# in-band validity plane instead of raw ASCII, cutting host->device
# transfer ~3x (the dominant cost of the real sketch pipeline when the
# link, not the chip, is the bottleneck).  XLA unpacks in the same jit;
# the Pallas kernel then consumes code+valid directly.
# ---------------------------------------------------------------------------

def _codes_kernel(code_ref, valid_ref, out_ref, *, k: int, p: int,
                  canon: bool):
    code = code_ref[...].astype(jnp.int32)
    valid = valid_ref[...] != 0
    out_ref[...] = _keys_from_code_valid(code, valid, k=k, p=p, canon=canon)


@functools.partial(jax.jit, static_argnames=("k", "p", "canon", "interpret"))
def encode_hash_keys_from_codes(code: jnp.ndarray, valid: jnp.ndarray, *,
                                k: int, p: int, canon: bool = True,
                                interpret: bool = False) -> jnp.ndarray:
    """(R, C) int32 2-bit codes + validity -> (R, C - k + 1) int32 keys."""
    R, C = code.shape
    W = C - k + 1
    assert R % BLOCK_R == 0, R
    grid = (R // BLOCK_R,)
    spec = pl.BlockSpec((BLOCK_R, C), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_codes_kernel, k=k, p=p, canon=canon),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((BLOCK_R, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, W), jnp.int32),
        interpret=interpret,
    )(code, valid)


def unpack_2bit(packed: jnp.ndarray, vbits: jnp.ndarray, C: int):
    """(R, C/4) uint8 packed codes + (R, C/8) uint8 validity bits ->
    ((R, C) int32 codes, (R, C) int32 valid).  Pure XLA; negligible next
    to the transfer it saves."""
    R = packed.shape[0]
    pb = packed.astype(jnp.int32)
    code = jnp.stack([(pb >> (2 * j)) & 3 for j in range(4)],
                     axis=-1).reshape(R, -1)[:, :C]
    vb = vbits.astype(jnp.int32)
    valid = jnp.stack([(vb >> j) & 1 for j in range(8)],
                      axis=-1).reshape(R, -1)[:, :C]
    return code, valid
