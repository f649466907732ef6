"""Probe: indicator-matmul dtype on the MXU — int8 (production) vs int4
vs bf16 at the pair_stats geometry (1024 x 16384 indicators, int32/f32
accumulation).  If int4 runs ~2x int8 on this target, pair_stats' level
loop gets a free doubling; if it is emulated (common on v5e-class chips)
it will show as a slowdown and this file documents the dead end.

Run on TPU:  python benchmarks/stats_dtype_probe.py [n] [m] [reps]
"""
from __future__ import annotations

import sys
import time

import numpy as np

import _common
_common.setup()


def main(n: int = 1024, m: int = 16384, reps: int = 64):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    a = (rng.random((n, m)) < 0.5).astype(np.int8)
    b = (rng.random((n, m)) < 0.5).astype(np.int8)

    def timed(dtype, acc):
        def one(x, y):
            return jax.lax.dot_general(
                x.astype(dtype), y.astype(dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=acc)

        @jax.jit
        def loop(x, y):
            def body(i, carry):
                s, x = carry
                # thread the carry into the input so XLA cannot hoist
                bump = (s - jnp.floor(s) > 2.0).astype(x.dtype)
                x = x.at[0, 0].add(bump)
                return s + one(x, y).astype(jnp.float32).sum(), x
            return jax.lax.fori_loop(0, reps, body,
                                     (jnp.float32(0.0), x))[0]

        xa, xb = jnp.asarray(a), jnp.asarray(b)
        try:
            _ = jax.device_get(loop(xa, xb))
        except Exception as e:
            return None, f"{type(e).__name__}: {str(e)[:120]}"
        dt = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = jax.device_get(loop(xa, xb))
            dt = min(dt, (time.perf_counter() - t0) / reps)
        return dt, None

    macs = 2.0 * n * n * m
    for name, dtype, acc in (
            ("int8 -> int32", jnp.int8, jnp.int32),
            ("int4 -> int32", "int4", jnp.int32),
            ("bf16 -> f32  ", jnp.bfloat16, jnp.float32),
            ("f32  -> f32  ", jnp.float32, jnp.float32)):
        if dtype == "int4":
            if not hasattr(jnp, "int4"):
                print("int4: dtype not available in this jax")
                continue
            dtype = jnp.int4
        dt, err = timed(dtype, acc)
        if err:
            print(f"{name}: FAILED ({err})")
        else:
            print(f"{name}: {dt*1e3:7.3f} ms/matmul  "
                  f"{macs/dt/1e12:6.1f} Teff-op/s")


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:]]
    main(*args)
