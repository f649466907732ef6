"""How many blind Newton iterations does the joint MLE actually need?

Generates a battery of synthetic register-pair statistics spanning
cardinality ratios (2e3..6e7 x 2e3..6e7) and overlaps (0..0.9) at p=14,
runs joint_mle at iters in {3..14} and reports the worst and RMS
deviation of the derived Jaccard index against a converged iters=30 run
of the SAME f32 code (self-truth: isolates iteration count from every
other error source).  The production default (10, reduced from 14 in
round 2) is re-justified or reduced from this table.

Register banks are sampled DIRECTLY from the idealized-hash HLL model
(per bucket: P(reg <= r) = (1 - 2^-r / m)^n, inverted from a uniform),
then A = max(onlyA, shared), B = max(onlyB, shared) — hashing real
element streams at 6e7 elements/case is minutes/case on this host and
adds nothing to an iteration-count study.

CPU is fine:  DASHING_TPU_PLATFORM=cpu python benchmarks/jmle_iters_probe.py
"""
from __future__ import annotations

import sys

import numpy as np

import _common
_common.setup()


def _sample_regs(rng, n: int, m: int, q: int) -> np.ndarray:
    """One register bank for an n-element set under the idealized model."""
    if n <= 0:
        return np.zeros(m, np.int64)
    u = rng.random(m)
    # smallest r with (1 - 2^-r/m)^n >= u  <=>  2^-r <= m*(1 - u^(1/n))
    t = np.maximum(m * (-np.expm1(np.log(u) / n)), 1e-300)
    r = np.ceil(-np.log2(t)).astype(np.int64)
    return np.clip(r, 0, q + 1)


def main(p: int = 14, seed: int = 0):
    import jax
    import jax.numpy as jnp
    from dashing_tpu.sketch import estimators as est

    rng = np.random.default_rng(seed)
    m = 1 << p
    q = 64 - p
    K = q + 2
    cases = [(ca, cb, frac)
             for ca in (2e3, 3e4, 4e5, 5e6, 6e7)
             for cb in (2e3, 3e4, 4e5, 5e6, 6e7)
             for frac in (0.0, 0.01, 0.1, 0.3, 0.6, 0.9)]

    rows = {k: [] for k in ("eq", "gt_a", "gt_b", "lt_a", "lt_b")}
    ji_true = []
    lev = np.arange(K)[None, :]
    for ca, cb, frac in cases:
        nsh = int(min(ca, cb) * frac)
        na, nb = int(ca) - nsh, int(cb) - nsh
        rs = _sample_regs(rng, nsh, m, q)
        ra = np.maximum(_sample_regs(rng, na, m, q), rs)
        rb = np.maximum(_sample_regs(rng, nb, m, q), rs)
        oa = ra[:, None] == lev
        ob = rb[:, None] == lev
        rows["eq"].append((oa & ob).sum(0))
        rows["gt_a"].append((oa & (ra > rb)[:, None]).sum(0))
        rows["gt_b"].append((ob & (rb > ra)[:, None]).sum(0))
        rows["lt_a"].append((oa & (ra < rb)[:, None]).sum(0))
        rows["lt_b"].append((ob & (rb < ra)[:, None]).sum(0))
        ji_true.append(nsh / max(na + nb + nsh, 1))

    stats = {k: jnp.asarray(np.stack(v).astype(np.float32))
             for k, v in rows.items()}
    # marginal + union histograms for the cardinality inits
    stats["hist_a"] = stats["eq"] + stats["gt_a"] + stats["lt_a"]
    stats["hist_b"] = stats["eq"] + stats["gt_b"] + stats["lt_b"]
    stats["hist_u"] = stats["eq"] + stats["gt_a"] + stats["gt_b"]

    def ji_at(iters):
        tri = jax.jit(jax.vmap(
            lambda s: est.joint_mle(s, p, iters=iters)))(stats)
        tri = np.asarray(tri, np.float64)
        return tri[:, 2] / np.maximum(tri.sum(1), 1e-30)

    truth = ji_at(30)
    errs_true = truth - np.asarray(ji_true)
    print(f"p={p}, {len(cases)} cases; iters=30 vs exact truth: "
          f"max|dJI| {np.abs(errs_true).max():.2e}  "
          f"rms {np.sqrt((errs_true**2).mean()):.2e}", file=sys.stderr)
    print(f"{'iters':>6} {'max|dJI| vs it30':>18} {'rms':>12}")
    for it in (3, 4, 5, 6, 7, 8, 10, 14):
        d = ji_at(it) - truth
        print(f"{it:>6} {np.abs(d).max():>18.3e} "
              f"{np.sqrt((d**2).mean()):>12.3e}")


if __name__ == "__main__":
    args = [int(x) for x in sys.argv[1:]]
    main(*args)
