"""Real-TPU numeric check for the fused union-cardinality MLE kernel.

python benchmarks/mle_kernel_check.py     # correctness vs XLA path

A/B throughput: benchmarks/allpairs_bench.py with
DASHING_TPU_PALLAS_MLE=0 vs =1 (the bench routes triples_from_stats).
"""
from __future__ import annotations

import os
import sys
import numpy as np

import _common
_common.setup()



def check():
    import jax.numpy as jnp
    from dashing_tpu.ops import pairwise as pw
    from dashing_tpu.sketch import estimators as est
    rng = np.random.default_rng(0)
    p, kmin, K = 14, 6, 14
    kmax = kmin + K - 1
    a = rng.integers(kmin, kmax, size=(96, 1 << p)).astype(np.int32)
    b = rng.integers(kmin, kmax, size=(200, 1 << p)).astype(np.int32)
    stats = pw.pair_stats(jnp.asarray(a), jnp.asarray(b), kmax, False, kmin)
    for estim, name in ((est.ERTL_MLE, "MLE"),
                        (est.ERTL_IMPROVED, "IMPROVED"),
                        (est.ORIGINAL, "ORIGINAL")):
        os.environ["DASHING_TPU_PALLAS_MLE"] = "0"
        want = np.asarray(pw.triples_from_stats(stats, p, estim,
                                                est.ERTL_MLE, kmin))
        os.environ["DASHING_TPU_PALLAS_MLE"] = "1"
        c_a = est.estimate_windowed(stats["hist_a"], p, kmin, estim)
        c_b = est.estimate_windowed(stats["hist_b"], p, kmin, estim)
        got = pw._pallas_union_triples(stats, c_a, c_b, p, kmin, estim)
        assert got is not None, "kernel did not engage"
        got = np.asarray(got)
        ji_w = want[..., 2] / np.maximum(want.sum(-1), 1e-30)
        ji_g = got[..., 2] / np.maximum(got.sum(-1), 1e-30)
        print(f"{name}: max |dJI| {float(np.abs(ji_g - ji_w).max()):.3g}  "
              "max rel tri "
              f"{float((np.abs(got - want) / np.maximum(np.abs(want), 1.0)).max()):.3g}")
        assert np.abs(ji_g - ji_w).max() < 1e-5, name
    print("TPU union-MLE kernel vs XLA path: OK")


if __name__ == "__main__":
    check()
