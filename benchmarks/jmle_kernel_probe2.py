"""Round-2 probes: which broadcast shapes crash Mosaic on this toolchain.

python benchmarks/jmle_kernel_probe2.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

import _common
_common.setup()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, BA, BB = 31, 16, 128


def probe(name, kernel, in_shapes):
    specs = [pl.BlockSpec(s, (lambda i: (0,) * len(s)),
                          memory_space=pltpu.VMEM) for s in in_shapes]
    try:
        f = pl.pallas_call(
            kernel, grid=(1,), in_specs=specs,
            out_specs=pl.BlockSpec((BA, BB), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BA, BB), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=12 << 20))
        args = [jnp.ones(s, jnp.float32) for s in in_shapes]
        r = jax.device_get(jax.jit(f)(*args))
        print(f"{name:44s} OK   sum={float(np.sum(r)):.3g}", flush=True)
    except Exception as e:
        print(f"{name:44s} FAIL {str(e)[:120]}", flush=True)


def k_lane_bcast(a_ref, b_ref, out):
    # (K, BA, 1) * (K, BA, BB)
    out[...] = (a_ref[...] * b_ref[...]).sum(0)


def k_sublane_bcast(a_ref, b_ref, out):
    # (K, 1, BB) * (K, BA, BB)
    out[...] = (a_ref[...] * b_ref[...]).sum(0)


def k_lead_bcast(a_ref, b_ref, out):
    # (BA, BB) * (K, BA, BB)
    out[...] = (a_ref[...] * b_ref[...]).sum(0)


def k_iota_full(b_ref, out):
    kk = jax.lax.broadcasted_iota(jnp.int32, (K, BA, BB), 0
                                  ).astype(jnp.float32)
    out[...] = (jnp.exp2(-kk) * b_ref[...]).sum(0)


def k_card_bcast(a_ref, b_ref, out):
    # (BA, 1) * (BA, BB)  (the cards init shape)
    out[...] = a_ref[...] * b_ref[...]


def k_iota_k1(b_ref, out):
    # constants at (K, 1, 1) via iota then EXPLICIT broadcast_to
    kk = jax.lax.broadcasted_iota(jnp.int32, (K, 1, 1), 0).astype(jnp.float32)
    kkf = jnp.broadcast_to(jnp.exp2(-kk), (K, BA, BB))
    out[...] = (kkf * b_ref[...]).sum(0)


if __name__ == "__main__":
    probe("(K,BA,1) lane bcast", k_lane_bcast,
          [(K, BA, 1), (K, BA, BB)])
    probe("(K,1,BB) sublane bcast", k_sublane_bcast,
          [(K, 1, BB), (K, BA, BB)])
    probe("(BA,BB) leading bcast", k_lead_bcast,
          [(BA, BB), (K, BA, BB)])
    probe("full-shape iota consts", k_iota_full, [(K, BA, BB)])
    probe("(BA,1)*(BA,BB) cards", k_card_bcast, [(BA, 1), (BA, BB)])
    probe("(K,1,1) iota + broadcast_to", k_iota_k1, [(K, BA, BB)])
