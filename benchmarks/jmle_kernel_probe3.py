"""Round-3 probes: 1-D arange, leading broadcasts, eye-style constants.

python benchmarks/jmle_kernel_probe3.py
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
    def mk_map(nd):
        return lambda i: (0,) * nd
    specs = [pl.BlockSpec(s, mk_map(len(s)), memory_space=pltpu.VMEM)
             for s in in_shapes]
    try:
        f = pl.pallas_call(
            kernel, grid=(1,), in_specs=specs,
            out_specs=pl.BlockSpec((BA, BB), mk_map(2),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BA, BB), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=12 << 20))
        args = [jnp.ones(s, jnp.float32) for s in in_shapes]
        r = jax.device_get(jax.jit(f)(*args))
        print(f"{name:44s} OK   sum={float(np.sum(r)):.3g}", flush=True)
    except Exception as e:
        print(f"{name:44s} FAIL {str(e)[:120]}", flush=True)


def k_lead(a_ref, b_ref, out):
    # (BA, BB) leading-broadcast against (K, BA, BB)
    out[...] = (a_ref[...] * b_ref[...]).sum(0)


def k_arange1d(b_ref, out):
    k = jnp.arange(0, K, dtype=jnp.int32).astype(jnp.float32)
    out[...] = (k.reshape(K, 1, 1) * b_ref[...]).sum(0)


def k_iota_k11_implicit(b_ref, out):
    # (K,1,1) broadcasted_iota, IMPLICIT broadcast in the multiply
    kk = jax.lax.broadcasted_iota(jnp.int32, (K, 1, 1), 0
                                  ).astype(jnp.float32)
    out[...] = (kk * b_ref[...]).sum(0)


def k_eye(b_ref, out):
    eye = jnp.eye(3, dtype=jnp.float32).reshape(3, 3, 1, 1)
    s = b_ref[...].sum(0)
    H = jnp.stack([jnp.stack([s, s, s])] * 3)
    out[...] = (H - 1e-4 * eye)[0, 0]


def k_cond_lead(b_ref, out):
    # where(cond (BA,BB), x (3,BA,BB), y) leading broadcast of cond
    s = b_ref[...].sum(0)
    x = jnp.stack([s, s + 1, s + 2])
    out[...] = jnp.where(jnp.isfinite(x).all(0), x, x * 0.5)[1]


if __name__ == "__main__":
    probe("(BA,BB) leading bcast", k_lead, [(BA, BB), (K, BA, BB)])
    probe("1-D arange reshape (K,1,1)", k_arange1d, [(K, BA, BB)])
    probe("(K,1,1) iota implicit bcast", k_iota_k11_implicit,
          [(K, BA, BB)])
    probe("eye(3) (3,3,1,1) bcast", k_eye, [(K, BA, BB)])
    probe("where cond leading bcast", k_cond_lead, [(K, BA, BB)])
