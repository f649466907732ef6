"""Bisection probes for the pallas_jmle Mosaic compile crash (HTTP 500).

Each probe compiles a minimal kernel exercising one ingredient of the
Newton kernel on the real TPU; run:  python benchmarks/jmle_kernel_probe.py
"""
from __future__ import annotations

import functools
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


def probe(name, kernel, nin=1, nout=1):
    specs = [pl.BlockSpec((K, BA, BB), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)] * nin
    outs = [pl.BlockSpec((BA, BB), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)] * nout
    try:
        f = pl.pallas_call(
            kernel, grid=(2,), in_specs=specs, out_specs=outs[0],
            out_shape=jax.ShapeDtypeStruct((2 * BA, BB), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=12 << 20))
        args = [jnp.ones((K, 2 * BA, BB), jnp.float32)] * nin
        r = jax.device_get(jax.jit(f)(*args))
        print(f"{name:40s} OK   sum={float(np.sum(r)):.3g}", flush=True)
    except Exception as e:
        print(f"{name:40s} FAIL {str(e)[:140]}", flush=True)


def k_sum(ref, out):
    out[...] = ref[...].sum(0)


def k_bcast_const(ref, out):
    kk = jnp.arange(0, K, dtype=jnp.int32).astype(jnp.float32)
    kk = kk.reshape((K, 1, 1))
    out[...] = (ref[...] * jnp.exp2(-kk)).sum(0)


def k_exp_chain(ref, out):
    x = ref[...]
    a = jnp.maximum(x, 1e-30)
    w = 1.0 / (jnp.exp(a) - 1.0)
    out[...] = (w * a).sum(0)


def k_log(ref, out):
    x = ref[...]
    out[...] = jnp.where(x > 0, x * jnp.log(jnp.maximum(x, 1e-30)), 0.0).sum(0)


def k_stack3(ref, out):
    s = ref[...].sum(0)
    t = jnp.stack([s, s * 2, s * 3])
    out[...] = t[0] + t[2]


def k_fori(ref, out):
    x = ref[...]

    def body(_, u):
        s = jnp.stack([u[0] * 2.0, u[1] + 1.0, u[2]])
        return jnp.where(jnp.isfinite(s).all(0), s, u)

    s0 = x.sum(0)
    u = jax.lax.fori_loop(0, 10, body, jnp.stack([s0, s0, s0]))
    out[...] = u[0]


def k_solve(ref, out):
    from dashing_tpu.sketch.estimators import _solve3_sym
    s = ref[...].sum(0)
    g = jnp.stack([s, s + 1, s + 2])
    H = jnp.stack([jnp.stack([s + 3, s, s]),
                   jnp.stack([s, s + 3, s]),
                   jnp.stack([s, s, s + 3])])
    out[...] = _solve3_sym(H, g)[0]


def k_fd1d2(ref, out):
    from dashing_tpu.sketch.estimators import _f_d1_d2
    h = ref[...]
    lam = h.sum(0) + 2.0
    d1, d2 = _f_d1_d2(h, lam, 16384.0, 50, 8, kfirst=True)
    out[...] = d1 + d2


def k_gradhess(ref, out):
    from dashing_tpu.sketch.estimators import _joint_grad_hess
    h = ref[...]
    stats = dict(eq=h, gt_a=h, gt_b=h, lt_a=h, lt_b=h)
    s = h.sum(0)
    theta = jnp.stack([s * 0 + 1.0, s * 0 + 1.0, s * 0 + 1.0])
    g, H = _joint_grad_hess(theta, stats, 16384.0, 50, 8, kfirst=True)
    out[...] = g[0] + H[0, 0]


def k_logl(ref, out):
    from dashing_tpu.sketch.estimators import _joint_logl
    h = ref[...]
    stats = dict(eq=h, gt_a=h, gt_b=h, lt_a=h, lt_b=h)
    s = h.sum(0)
    theta = jnp.stack([s * 0 + 1.0, s * 0 + 1.0, s * 0 + 1.0])
    out[...] = _joint_logl(theta, stats, 16384.0, 50, 8, kfirst=True)


if __name__ == "__main__":
    probe("sum over K", k_sum)
    probe("broadcast (K,1,1) consts", k_bcast_const)
    probe("exp chain", k_exp_chain)
    probe("log/where", k_log)
    probe("stack3 + index", k_stack3)
    probe("fori 3-carry", k_fori)
    probe("solve3", k_solve)
    probe("_f_d1_d2 kfirst", k_fd1d2)
    probe("_joint_grad_hess kfirst", k_gradhess)
    probe("_joint_logl kfirst", k_logl)
