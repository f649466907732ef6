"""Probe: is one (n, m) @ (m, 2n) indicator matmul faster than two
(n, m) @ (m, n) ones?  The joint stats' X and Y families share the
A-side indicator (ca_k) and differ only in the B side (cb_k vs
cb_{k-1}), so a B-side concat halves the launch count per level at the
same MAC count — worth it exactly if per-launch overhead is a real
fraction of the 0.27 ms in-situ per-matmul cost.

Run on TPU:  python benchmarks/stats_concat_probe.py [n] [m] [reps]
"""
from __future__ import annotations

import sys
import time

import numpy as np

import _common
_common.setup()


def main(n: int = 1024, m: int = 16384, reps: int = 32):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    a = (rng.random((n, m)) < 0.5).astype(np.int8)
    b1 = (rng.random((n, m)) < 0.5).astype(np.int8)
    b2 = (rng.random((n, m)) < 0.6).astype(np.int8)

    def dot(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)

    def timed(fn):
        @jax.jit
        def loop(x, y1, y2):
            def body(i, carry):
                s, x = carry
                bump = (s - jnp.floor(s) > 2.0).astype(x.dtype)
                x = x.at[0, 0].add(bump)
                return s + fn(x, y1, y2), x
            return jax.lax.fori_loop(0, reps, body,
                                     (jnp.float32(0.0), x))[0]
        args = (jnp.asarray(a), jnp.asarray(b1), jnp.asarray(b2))
        _ = jax.device_get(loop(*args))
        dt = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = jax.device_get(loop(*args))
            dt = min(dt, (time.perf_counter() - t0) / reps)
        return dt

    two = timed(lambda x, y1, y2: (dot(x, y1).sum() +
                                   dot(x, y2).sum()).astype(jnp.float32))
    one = timed(lambda x, y1, y2: dot(
        x, jnp.concatenate([y1, y2], 0)).sum().astype(jnp.float32))
    macs = 2.0 * 2 * n * n * m
    print(f"two (n x n) matmuls : {two*1e3:7.3f} ms  "
          f"{macs/two/1e12:6.1f} Teff-op/s")
    print(f"one (n x 2n) matmul : {one*1e3:7.3f} ms  "
          f"{macs/one/1e12:6.1f} Teff-op/s")


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:]]
    main(*args)
