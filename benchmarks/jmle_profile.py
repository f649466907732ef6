"""JMLE cost decomposition: sweep Newton iteration counts to split the
fixed cost (pair stats + init + final value checks) from the per-iteration
cost.  Run on TPU: python benchmarks/jmle_profile.py [n] [p]"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("DASHING_TPU_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["DASHING_TPU_PLATFORM"])


def main(n: int = 256, p: int = 14):
    import jax
    import jax.numpy as jnp
    from dashing_tpu.ops import pairwise as pw
    from dashing_tpu.sketch import estimators as est

    rng = np.random.default_rng(0)
    lam = 5e6 / (1 << p)
    regs = np.minimum(
        rng.geometric(0.5, size=(n, 1 << p)) - 1 +
        np.maximum(np.log2(lam), 0).astype(np.int64), 64 - p + 1
    ).astype(np.int32)
    kmin, kmax = int(regs.min()), int(regs.max()) + 1
    print(f"n={n} p={p} levels [{kmin}, {kmax}]", file=sys.stderr)
    a = jnp.asarray(regs)
    REPS = 8

    def timed(label, jitted):
        _ = jax.device_get(jitted(a))
        dt = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = jax.device_get(jitted(a))
            dt = min(dt, (time.perf_counter() - t0) / REPS)
        print(f"{label:28s} {dt*1e3:7.2f} ms  ({n*n/dt/1e6:6.2f} M pairs/s)",
              flush=True)
        return dt

    def make(iters, with_newton=True, stats_only=False):
        @jax.jit
        def run(a):
            def body(i, acc):
                bump = (acc - jnp.floor(acc) > 2.0).astype(a.dtype)
                aa = a.at[0, 0].add(bump)
                stats = pw.pair_stats(aa, a, kmax, True, kmin)
                if stats_only:
                    return acc + stats["eq"].sum()
                cum = stats["cum_union"]
                hist_u_w = jnp.concatenate(
                    [cum[..., :1], cum[..., 1:] - cum[..., :-1]], axis=-1)
                eq, gt_a, gt_b = stats["eq"], stats["gt_a"], stats["gt_b"]
                ha = jnp.broadcast_to(stats["hist_a"][:, None, :], eq.shape)
                hb = jnp.broadcast_to(stats["hist_b"][None, :, :], eq.shape)
                c_a = est.mle_estimate_windowed(stats["hist_a"], p, kmin)
                c_b = est.mle_estimate_windowed(stats["hist_b"], p, kmin)
                c_u = est.improved_estimate_windowed(hist_u_w, p, kmin)
                flat = lambda x: x.reshape(-1, x.shape[-1])
                sdict = dict(eq=flat(eq), gt_a=flat(gt_a), gt_b=flat(gt_b),
                             lt_a=flat(ha - eq - gt_a),
                             lt_b=flat(hb - eq - gt_b))
                nn = n * n
                cards = (jnp.broadcast_to(c_a[:, None], (n, n)).reshape(-1),
                         jnp.broadcast_to(c_b[None, :], (n, n)).reshape(-1),
                         c_u.reshape(-1))
                tri = jax.vmap(lambda s, c: est.joint_mle(
                    s, p, iters=iters, kmin=kmin, cards=c))(sdict, cards)
                return acc + tri.sum()
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))
        return run

    t_stats = timed("stats only", make(0, stats_only=True))
    t0 = timed("iters=0 (init+2 logl)", make(0))
    t2 = timed("iters=2", make(2))
    t10 = timed("iters=10", make(10))
    per_it = (t10 - t2) / 8
    print(f"fixed(stats)={t_stats*1e3:.2f} ms, "
          f"fixed(init+finalchecks)={(t0-t_stats)*1e3:.2f} ms, "
          f"per-iteration={per_it*1e3:.3f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256,
         int(sys.argv[2]) if len(sys.argv) > 2 else 14)
